"""Point-query kernels: differentiable cross-view depth sampling and
transmittance integration.

Equivalents of `sampleDepthCUDA` (sample_forward.cu:430-700) and
`evaluateTransmittanceCUDA` (sample_forward.cu:55-169): each query 3D point is
projected into the view, binned to its pixel's tile, and the tile's
depth-sorted gaussian list is marched per point.

sample_depth returns, per point, the 3D point at the view's median depth along
the query pixel ray (in the view's camera frame) — the core of the PGSR
geometric loss (utils/loss_utils.py:160-198). Fully differentiable: gradients
flow both to the gaussians and to the query points (through the projection),
replacing the reference's hand-written sample_backward.cu.

integrate returns the half-gaussian CDF transmittance at each point's own ray
depth — the opacity-field sample used for marching-tetrahedra SDF extraction
(mesh_extract_tetrahedra.py:64-87).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.ops.raster import render_ref
from gsjax.ops.raster.binning import Binning, bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import preprocess

_F = render_ref._F


def _project_points(points, camera: Camera, cfg: RasterConfig):
    """Project query points into the view. Returns (point_xy, t_ray, inside0)."""
    hp = jax.lax.Precision.HIGHEST
    wv = camera.world_view
    pv = jnp.einsum("ni,ji->nj", points, wv[:3, :3], precision=hp) + wv[:3, 3]
    z = pv[:, 2]
    in_front = z > cfg.near_plane
    ph = jnp.einsum("ni,ji->nj", points, camera.full_proj[:3, :3], precision=hp) \
        + camera.full_proj[:3, 3]
    pw = jnp.einsum("ni,i->n", points, camera.full_proj[3, :3]) + camera.full_proj[3, 3]
    pp = ph / (pw[:, None] + 1e-7)
    px = ((pp[:, 0] + 1) * camera.width - 1) * 0.5
    py = ((pp[:, 1] + 1) * camera.height - 1) * 0.5
    inside0 = in_front & (px >= 0) & (px <= camera.width - 1) & \
        (py >= 0) & (py <= camera.height - 1)
    t_ray = jnp.linalg.norm(pv, axis=-1)
    return px, py, t_ray, inside0


def _point_tile(px, py, camera, cfg):
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    tx = jnp.clip((px // cfg.tile).astype(jnp.int32), 0, tiles_x - 1)
    ty = jnp.clip((py // cfg.tile).astype(jnp.int32), 0, tiles_y - 1)
    return ty * tiles_x + tx


def _march(feats_pairs, start, count, px, py, cfg, eval_t=None):
    """Per-point gaussian march (vmapped). Returns carry dict.

    If eval_t is given, also accumulates the CDF transmittance at that depth
    (integrate path)."""
    chunk = cfg.chunk
    n_chunks = -(-cfg.max_per_tile // chunk)
    log_tmin = math.log(cfg.transmittance_min)

    def chunk_body(carry, c):
        log_tg, last_idx, md_init, log_tp = carry
        base = start + c * chunk
        feats = jax.lax.dynamic_slice(feats_pairs, (base, 0), (chunk, _F))
        rel = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        entry_valid = rel < count
        gx, gy = feats[:, 0], feats[:, 1]
        ca, cb, cc = feats[:, 2], feats[:, 3], feats[:, 4]
        op = feats[:, 5]
        dx = gx - px
        dy = gy - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(cfg.alpha_clamp, op * jnp.exp(jnp.minimum(power, 0.0)))
        passes = (power <= 0.0) & (alpha >= cfg.alpha_min) & entry_valid
        a = jnp.where(passes, alpha, 0.0)
        log1m = jnp.log1p(-a)
        l_incl = log_tg + jnp.cumsum(log1m)
        keep = l_incl >= log_tmin
        l_prev = l_incl - log1m
        applied = passes & keep
        t_val = feats[:, 9] * dx + feats[:, 10] * dy + feats[:, 11]
        cond = applied & (jnp.exp(l_prev) > 0.5)
        best = jnp.max(jnp.where(cond, jnp.arange(chunk), -1))
        md_init = jnp.where(best >= 0, t_val[jnp.maximum(best, 0)], md_init)
        last_idx = jnp.maximum(last_idx, jnp.max(jnp.where(applied, rel, -1)))
        log_tg = log_tg + jnp.sum(log1m * keep)
        if eval_t is not None:
            rsig = feats[:, 12]
            delta = (t_val - eval_t) * rsig
            g = jnp.where(rsig > 0, jnp.exp(-0.5 * delta * delta), 0.0)
            om = jnp.maximum(1.0 - a * g, 1e-12)
            lf = jnp.where(eval_t > t_val,
                           log1m - 0.5 * jnp.log(om), 0.5 * jnp.log(om))
            log_tp = log_tp + jnp.sum(lf * applied)
        return (log_tg, last_idx, md_init, log_tp), None

    init = (jnp.zeros(()), jnp.full((), -1, jnp.int32), jnp.zeros(()), jnp.zeros(()))
    (log_tg, last_idx, md_init, log_tp), _ = jax.lax.scan(
        jax.checkpoint(chunk_body, policy=jax.checkpoint_policies.nothing_saveable),
        init, jnp.arange(n_chunks))
    return dict(t_final=jnp.exp(log_tg), n_contrib=last_idx + 1,
                md_init=md_init, t_point=jnp.exp(log_tp))


def _bisect_point(feats_pairs, start, n_contrib, md_init, t_final, px, py, cfg):
    """Median-depth bisection for one point (sample_forward.cu:591-700)."""
    chunk = cfg.chunk
    n_chunks = -(-cfg.max_per_tile // chunk)
    s_pts = cfg.split + 1

    in_range = t_final <= cfg.min_transmittance
    d_min = jnp.maximum(md_init - cfg.sample_range, 0.0)
    d_max = jnp.maximum(md_init + cfg.sample_range, 0.0)

    def eval_tp(d_min, d_max):
        interval = (d_max - d_min) / cfg.split
        ts = d_min + interval * jnp.arange(s_pts, dtype=jnp.float32)   # [S]

        def chunk_body(log_tp, c):
            base = start + c * chunk
            feats = jax.lax.dynamic_slice(feats_pairs, (base, 0), (chunk, _F))
            rel = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
            gx, gy = feats[:, 0], feats[:, 1]
            ca, cb, cc = feats[:, 2], feats[:, 3], feats[:, 4]
            op = feats[:, 5]
            dx = gx - px
            dy = gy - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(cfg.alpha_clamp, op * jnp.exp(jnp.minimum(power, 0.0)))
            passes = (power <= 0.0) & (alpha >= cfg.alpha_min) & (rel < n_contrib)
            a = jnp.where(passes, alpha, 0.0)
            t_peak = feats[:, 9] * dx + feats[:, 10] * dy + feats[:, 11]
            rsig = feats[:, 12]
            delta = (ts[None, :] - t_peak[:, None]) * rsig[:, None]    # [C,S]
            g = jnp.where(rsig[:, None] > 0, jnp.exp(-0.5 * delta * delta), 0.0)
            om = jnp.maximum(1.0 - a[:, None] * g, 1e-12)
            lf = jnp.where(ts[None, :] > t_peak[:, None],
                           jnp.log1p(-a)[:, None] - 0.5 * jnp.log(om),
                           0.5 * jnp.log(om))
            return log_tp + jnp.sum(lf * passes[:, None], axis=0), None

        log_tp, _ = jax.lax.scan(
            jax.checkpoint(chunk_body, policy=jax.checkpoint_policies.nothing_saveable),
            jnp.zeros((s_pts,)), jnp.arange(n_chunks))
        return jnp.exp(log_tp), interval

    t0 = t1 = None
    for it in range(cfg.split_iterations):
        tp, interval = eval_tp(d_min, d_max)
        if it == 0:
            in_range = in_range & (tp[0] >= 0.5) & (tp[cfg.split] <= 0.5)
        sid = jnp.zeros((), jnp.int32)
        for s in range(1, cfg.split):
            sid = jnp.where(tp[s] >= 0.5, s, sid)
        d_max = d_min + (sid + 1).astype(jnp.float32) * interval
        d_min = d_min + sid.astype(jnp.float32) * interval
        t0 = tp[sid]
        t1 = tp[sid + 1]

    denom = t0 - t1
    w_max = jnp.clip((t0 - 0.5) / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20),
                     0.0, 1.0)
    m_depth = jnp.where(in_range, w_max * d_max + (1.0 - w_max) * d_min, 0.0)
    return m_depth, in_range


@partial(jax.jit, static_argnames=("cfg", "point_batch"))
def sample_depth(points: jax.Array,
                 means3d, scales, rotations, opacities,
                 camera: Camera, cfg: RasterConfig,
                 alive=None, point_batch: int = 4096):
    """Differentiable cross-view median-depth sampling.

    Args:
      points: [Q,3] world-space query points (grads flow into them).
      means3d/scales/rotations/opacities: gaussian params (post-activation,
        3D-filtered — matching gaussian_renderer/__init__.py:252-264).

    Returns dict(point_cam [Q,3] in camera frame, sampled_depth [Q] z-depth,
                 inside [Q] bool).
    """
    q = points.shape[0]
    cfg = dataclasses.replace(cfg, sh_degree=0, sg_degree=0)  # colour unused
    shs = jnp.zeros((means3d.shape[0], 1, 3))
    prep = preprocess(means3d, scales, rotations, opacities, shs,
                      None, None, None, camera, cfg, alive)
    binning = bin_gaussians(prep, cfg, camera.width, camera.height)
    feats_pairs = render_ref.prepare_pairs(prep, binning, cfg)

    px, py, _t, inside0 = _project_points(points, camera, cfg)
    tile = _point_tile(px, py, camera, cfg)
    start = binning.tile_start[tile]
    count = jnp.where(inside0, binning.tile_count[tile], 0)

    pad = (-q) % point_batch
    def padded(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)
    pxp, pyp = padded(px), padded(py)
    startp, countp = padded(start), padded(count)
    n_batches = (q + pad) // point_batch

    def one_point(s, c, x, y):
        m = _march(feats_pairs, s, c, x, y, cfg)
        md, in_range = _bisect_point(feats_pairs, s, m["n_contrib"],
                                     m["md_init"], m["t_final"], x, y, cfg)
        return md, in_range

    def batch(_, b):
        sl = lambda z: jax.lax.dynamic_slice_in_dim(z, b * point_batch, point_batch)
        md, in_r = jax.vmap(one_point)(sl(startp), sl(countp), sl(pxp), sl(pyp))
        return None, (md, in_r)

    _, (md, in_r) = jax.lax.scan(batch, None, jnp.arange(n_batches))
    md = md.reshape(-1)[:q]
    in_r = in_r.reshape(-1)[:q]

    pnx = (px - (camera.width - 1) / 2.0) / camera.fx
    pny = (py - (camera.height - 1) / 2.0) / camera.fy
    rln = jax.lax.rsqrt(pnx * pnx + pny * pny + 1.0)
    depth = md * rln
    point_cam = jnp.stack([pnx * depth, pny * depth, depth], axis=-1)
    return dict(point_cam=point_cam, sampled_depth=depth,
                inside=in_r & inside0)


@partial(jax.jit, static_argnames=("cfg", "point_batch"))
def evaluate_sdf(points: jax.Array,
                 means3d, scales, rotations, opacities,
                 camera: Camera, cfg: RasterConfig,
                 alive=None, point_batch: int = 4096):
    """Single-view SDF: median ray depth at the point's pixel minus the
    point's own ray depth (evaluateSDFCUDA, sample_forward.cu:171-428; bound
    as `evaluate_sdf_from_signle_view` in ext.cpp:18).
    Returns dict(sdf [Q], depth [Q] median ray distance, inside [Q])."""
    q = points.shape[0]
    cfg = dataclasses.replace(cfg, sh_degree=0, sg_degree=0)
    shs = jnp.zeros((means3d.shape[0], 1, 3))
    prep = preprocess(means3d, scales, rotations, opacities, shs,
                      None, None, None, camera, cfg, alive)
    binning = bin_gaussians(prep, cfg, camera.width, camera.height)
    feats_pairs = render_ref.prepare_pairs(prep, binning, cfg)

    px, py, t_ray, inside0 = _project_points(points, camera, cfg)
    tile = _point_tile(px, py, camera, cfg)
    start = binning.tile_start[tile]
    count = jnp.where(inside0, binning.tile_count[tile], 0)

    pad = (-q) % point_batch
    def padded(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    n_batches = (q + pad) // point_batch
    arrs = tuple(map(padded, (start, count, px, py)))

    def one_point(s, c, x, y):
        m = _march(feats_pairs, s, c, x, y, cfg)
        md, in_range = _bisect_point(feats_pairs, s, m["n_contrib"],
                                     m["md_init"], m["t_final"], x, y, cfg)
        return md, in_range

    def batch(_, b):
        sl = lambda z: jax.lax.dynamic_slice_in_dim(z, b * point_batch, point_batch)
        return None, jax.vmap(one_point)(*map(sl, arrs))

    _, (md, in_r) = jax.lax.scan(batch, None, jnp.arange(n_batches))
    md = md.reshape(-1)[:q]
    in_r = in_r.reshape(-1)[:q]
    return dict(sdf=md - t_ray, depth=md, inside=in_r & inside0)


@partial(jax.jit, static_argnames=("cfg", "point_batch"))
def integrate(points: jax.Array,
              means3d, scales, rotations, opacities,
              camera: Camera, cfg: RasterConfig,
              alive=None, point_batch: int = 4096):
    """Transmittance of each query point along its camera ray
    (evaluateTransmittanceCUDA). Returns dict(alpha [Q], inside [Q])."""
    q = points.shape[0]
    cfg0 = dataclasses.replace(cfg, sh_degree=0, sg_degree=0)
    shs = jnp.zeros((means3d.shape[0], 1, 3))
    prep = preprocess(means3d, scales, rotations, opacities, shs,
                      None, None, None, camera, cfg0, alive)
    binning = bin_gaussians(prep, cfg0, camera.width, camera.height)
    feats_pairs = render_ref.prepare_pairs(prep, binning, cfg0)

    px, py, t_ray, inside0 = _project_points(points, camera, cfg0)
    tile = _point_tile(px, py, camera, cfg0)
    start = binning.tile_start[tile]
    count = jnp.where(inside0, binning.tile_count[tile], 0)

    pad = (-q) % point_batch
    def padded(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    n_batches = (q + pad) // point_batch
    arrs = tuple(map(padded, (start, count, px, py, t_ray)))

    def one_point(s, c, x, y, t):
        m = _march(feats_pairs, s, c, x, y, cfg0, eval_t=t)
        return m["t_point"]

    def batch(_, b):
        sl = lambda z: jax.lax.dynamic_slice_in_dim(z, b * point_batch, point_batch)
        return None, jax.vmap(one_point)(*map(sl, arrs))

    _, tp = jax.lax.scan(batch, None, jnp.arange(n_batches))
    tp = tp.reshape(-1)[:q]
    return dict(alpha=1.0 - tp, transmittance=tp, inside=inside0)
