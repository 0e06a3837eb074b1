"""Multi-chip data parallelism: tiles sharded over the device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3); this layer is the
TPU-native scaling design: gaussians replicated, *tiles/rays sharded* across
chips over ICI, parameter gradients psum-reduced inside the shard_mapped
backward. Densification stays replicated (identical on every device, keyed by
the same PRNG), so no cross-host reshuffling is required — each device holds
the full (small) parameter set while the pixel work scales linearly.

Layout per device under `shard_map`:
  - preprocess: computed replicated (single cheap per-gaussian pass).
  - binning: per-device — each chip expands/sorts only its own row band's
    (gaussian, tile) pairs (bin_gaussians row_lo/row_hi), so the sort +
    re-layout cost scales down with the mesh.
  - tile blend: each device renders its row band of tiles.
  - images: all_gathered so non-local losses (SSIM windows crossing tile
    boundaries) see the full frame; autodiff turns the gather into a scatter
    of image grads back to the owning device.
  - parameter grads: explicit psum over the mesh axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gsjax.model import gaussians as gm
from gsjax.ops.raster import render_pallas, render_ref
from gsjax.ops.raster.api import _use_pallas
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import preprocess
from gsjax.train import losses
from gsjax.train.step import LossConfig

AXIS = "tiles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def _render_local_tiles_pallas(prep, binning, camera: Camera,
                               cfg: RasterConfig, bg, my_tiles):
    """Pallas blend of a device-local slice of tiles (same per-chip kernels
    as the single-chip path; tile ids address global pixel coordinates)."""
    tiles_x, _ = cfg.grid(camera.width, camera.height)
    num_tiles_global = binning.tile_start.shape[0]
    t_local = my_tiles.shape[0]
    interpret = jax.default_backend() != "tpu"

    feats = render_ref.prepare_pairs(prep, binning, cfg)
    feats_t = render_pallas.pack_features_t(feats, cfg)
    in_bounds = my_tiles < num_tiles_global
    safe_ids = jnp.minimum(my_tiles, num_tiles_global - 1)
    starts = jnp.where(in_bounds, binning.tile_start[safe_ids], 0)
    counts = jnp.where(in_bounds, binning.tile_count[safe_ids], 0)
    cam_params = jnp.concatenate([
        jnp.asarray([camera.fx, camera.fy], jnp.float32),
        bg.astype(jnp.float32).reshape(3),
        jnp.asarray([camera.width, camera.height, 0.0], jnp.float32)])
    out = render_pallas.blend_pallas(
        feats_t, safe_ids, starts, counts, cam_params, cfg,
        tiles_x, t_local, interpret)
    return {
        "color": jnp.moveaxis(out[:, 0:3, :], 1, -1),
        "normal": jnp.moveaxis(out[:, 3:6, :], 1, -1),
        "alpha": out[:, 6, :],
        "median_depth": out[:, 7, :],
    }


def _render_local_tiles(prep, binning, camera: Camera, cfg: RasterConfig,
                        bg, my_tiles):
    """Blend a device-local slice of tiles. my_tiles: [T_local] global ids."""
    if _use_pallas(cfg):
        return _render_local_tiles_pallas(prep, binning, camera, cfg, bg,
                                          my_tiles)
    tiles_x, _ = cfg.grid(camera.width, camera.height)
    num_tiles_global = binning.tile_start.shape[0]
    t_local = my_tiles.shape[0]

    feats = render_ref.prepare_pairs(prep, binning, cfg)

    in_bounds = my_tiles < num_tiles_global
    safe_ids = jnp.minimum(my_tiles, num_tiles_global - 1)
    starts = jnp.where(in_bounds, binning.tile_start[safe_ids], 0)
    counts = jnp.where(in_bounds, binning.tile_count[safe_ids], 0)

    # small tile batches bound peak memory; count-sort within the device
    bs = min(cfg.tile_batch, t_local)
    nb = -(-t_local // bs)
    pad = nb * bs - t_local
    def padded(x):
        return jnp.pad(x, (0, pad))
    safe_p, starts_p, counts_p = padded(safe_ids), padded(starts), padded(counts)
    order = jnp.argsort(-counts_p)
    inv_order = jnp.argsort(order)
    safe_p, starts_p, counts_p = safe_p[order], starts_p[order], counts_p[order]

    def batch(_, b):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, b * bs, bs)
        out = render_ref.blend_tiles_batch(
            feats, sl(safe_p), sl(starts_p), sl(counts_p), tiles_x, cfg, bg,
            camera.width, camera.height, camera.fx, camera.fy)
        out.pop("n_contrib")
        return None, out

    _, outs = jax.lax.scan(batch, None, jnp.arange(nb))
    return {k: v.reshape((nb * bs,) + v.shape[2:])[inv_order][:t_local]
            for k, v in outs.items()}


def _tiles_to_image(tiles, tiles_x, tiles_y, width, height, cfg: RasterConfig):
    t = cfg.tile
    ch = tiles.shape[2:]
    v = tiles[: tiles_x * tiles_y].reshape((tiles_y, tiles_x, t, t) + ch)
    v = jnp.moveaxis(v, 2, 1).reshape((tiles_y * t, tiles_x * t) + ch)
    return v[:height, :width]


def _band_tiles(camera: Camera, cfg: RasterConfig, n_dev: int):
    """Row-aligned tile bands: device d owns tile rows [d*rp, (d+1)*rp).

    Row alignment lets each device bin ONLY its band's pairs
    (bin_gaussians row_lo/row_hi) instead of replicating the global sort."""
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    rows_per = -(-tiles_y // n_dev)
    t_pad = n_dev * rows_per * tiles_x
    tile_ids = jnp.arange(t_pad, dtype=jnp.int32).reshape(n_dev, -1)
    return tiles_x, tiles_y, rows_per, tile_ids


def render_sharded(params: gm.GaussianParams, aux: gm.GaussianAux,
                   camera: Camera, cfg: RasterConfig, bg, mesh: Mesh,
                   dev_pair_capacity: int | None = None):
    """Full-frame render with tiles sharded over the mesh."""
    n_dev = mesh.devices.size
    tiles_x, tiles_y, rows_per, tile_ids = _band_tiles(camera, cfg, n_dev)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P(AXIS)),
             out_specs=P(), check_vma=False)
    def run(p, aux_, bg_, my_tiles):
        scales, opac = gm.scaling_n_opacity_with_3d_filter(p, aux_.filter_3d)
        prep = preprocess(p.xyz, scales, p.rotation, opac, gm.get_features(p),
                          gm.get_sg_axis(p), gm.get_sg_sharpness(p), p.sg_color,
                          camera, cfg, aux_.alive)
        row_lo = jax.lax.axis_index(AXIS) * rows_per
        binning = bin_gaussians(prep, cfg, camera.width, camera.height,
                                row_lo=row_lo,
                                row_hi=jnp.minimum(row_lo + rows_per, tiles_y),
                                pair_capacity=dev_pair_capacity)
        local = _render_local_tiles(prep, binning, camera, cfg, bg_, my_tiles[0])
        gathered = {k: jax.lax.all_gather(v, AXIS, tiled=True) for k, v in local.items()}
        return gathered

    tiles = run(params, aux, bg, tile_ids)
    return {k: _tiles_to_image(v, tiles_x, tiles_y, camera.width, camera.height, cfg)
            for k, v in tiles.items()}


def train_step_sharded(params: gm.GaussianParams, aux: gm.GaussianAux,
                       adam: gm.AdamState, camera: Camera, gt_image, bg,
                       lrs, cfg: RasterConfig, loss_cfg: LossConfig, mesh: Mesh,
                       near_cam: Camera | None = None,
                       gray_r=None, gray_n=None,
                       dev_pair_capacity: int | None = None):
    """Sharded train step: per-device tile blend, psum'd parameter grads,
    replicated Adam update. When a neighbour view is given and
    loss_cfg.mv_on, the PGSR multi-view terms run band-sharded: each device
    samples the neighbour depth for its own horizontal band of the frame and
    the masked sums are psum'd (SURVEY section 2.3)."""
    n_dev = mesh.devices.size
    tiles_x, tiles_y, rows_per, tile_ids = _band_tiles(camera, cfg, n_dev)
    mv_on = (loss_cfg.reg_on and loss_cfg.mv_on and cfg.require_depth
             and near_cam is not None
             and (loss_cfg.lambda_mv_ncc > 0 or loss_cfg.lambda_mv_geo > 0))
    if gray_r is None:
        gray_r = jnp.zeros((camera.height, camera.width))
    if gray_n is None:
        gray_n = jnp.zeros((camera.height, camera.width))
    band = -(-camera.height // n_dev)          # rows per device

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(AXIS), P(), P()),
             out_specs=(P(), P()), check_vma=False)
    def run(p, aux_, gt, bg_, my_tiles, gr, gn):
        def loss_fn(p_):
            scales, opac = gm.scaling_n_opacity_with_3d_filter(p_, aux_.filter_3d)
            prep = preprocess(p_.xyz, scales, p_.rotation, opac,
                              gm.get_features(p_), gm.get_sg_axis(p_),
                              gm.get_sg_sharpness(p_), p_.sg_color,
                              camera, cfg, aux_.alive)
            row_lo = jax.lax.axis_index(AXIS) * rows_per
            binning = bin_gaussians(
                prep, cfg, camera.width, camera.height, row_lo=row_lo,
                row_hi=jnp.minimum(row_lo + rows_per, tiles_y),
                pair_capacity=dev_pair_capacity)
            local = _render_local_tiles(prep, binning, camera, cfg, bg_, my_tiles[0])
            full = {k: jax.lax.all_gather(v, AXIS, tiled=True)
                    for k, v in local.items()}
            img = _tiles_to_image(full["color"], tiles_x, tiles_y,
                                  camera.width, camera.height, cfg)
            ll1 = losses.l1_loss(img, gt)
            ssim_val = losses.ssim(img, gt)
            loss = (1 - loss_cfg.lambda_dssim) * ll1 + \
                loss_cfg.lambda_dssim * (1 - ssim_val)
            need_geom = loss_cfg.reg_on and cfg.require_depth and (
                loss_cfg.lambda_depth_normal > 0 or mv_on)
            if need_geom:
                depth = _tiles_to_image(full["median_depth"], tiles_x, tiles_y,
                                        camera.width, camera.height, cfg)
                nrm = _tiles_to_image(full["normal"], tiles_x, tiles_y,
                                      camera.width, camera.height, cfg)
            if loss_cfg.reg_on and loss_cfg.lambda_depth_normal > 0 and cfg.require_depth:
                dnormal, valid = losses.depth_to_normal(
                    depth, camera.fx, camera.fy, camera.cx, camera.cy)
                loss = loss + loss_cfg.lambda_depth_normal * \
                    losses.depth_normal_loss(nrm, dnormal, valid)
            if mv_on:
                from gsjax.train.multiview import patchmatch_terms
                # this device's horizontal band (pad rows -> depth 0 -> masked)
                r0 = jax.lax.axis_index(AXIS) * band
                pad_rows = band * n_dev - camera.height
                dep_p = jnp.pad(depth, ((0, pad_rows), (0, 0)))
                nrm_p = jnp.pad(nrm, ((0, pad_rows), (0, 0), (0, 0)))
                dep_b = jax.lax.dynamic_slice_in_dim(dep_p, r0, band, 0)
                nrm_b = jax.lax.dynamic_slice_in_dim(nrm_p, r0, band, 0)
                ncc_s, ncc_c, geo_s, geo_c = patchmatch_terms(
                    dep_b, nrm_b, p_.xyz, scales, p_.rotation, opac,
                    aux_.alive, camera, near_cam, gr, gn, cfg,
                    loss_cfg.pixel_noise_th, loss_cfg.patch_size,
                    row_offset=r0)
                ncc_s = jax.lax.psum(ncc_s, AXIS)
                ncc_c = jax.lax.psum(ncc_c, AXIS)
                geo_s = jax.lax.psum(geo_s, AXIS)
                geo_c = jax.lax.psum(geo_c, AXIS)
                any_mask = geo_c > 0
                ncc_l = jnp.where(any_mask, ncc_s / jnp.maximum(ncc_c, 1), 0.0)
                geo_l = jnp.where(any_mask, geo_s / jnp.maximum(geo_c, 1), 0.0)
                loss = loss + loss_cfg.lambda_mv_ncc * ncc_l \
                    + loss_cfg.lambda_mv_geo * geo_l
            return loss

        loss, gp = jax.value_and_grad(loss_fn)(p)
        gp = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, AXIS), gp)

        def _mask(g):
            m = aux_.alive.reshape((-1,) + (1,) * (g.ndim - 1))
            return jnp.where(m, g, 0.0)
        gp = jax.tree_util.tree_map(_mask, gp)
        return loss, gp

    loss, gp = run(params, aux, gt_image, bg, tile_ids, gray_r, gray_n)
    params, adam = gm.adam_update(params, gp, adam, lrs)
    return params, adam, loss
