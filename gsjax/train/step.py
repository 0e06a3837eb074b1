"""Jitted training step: render -> losses -> grads -> Adam -> stats.

Mirrors the hot loop of `train.py:89-263` (loss assembly at :169-191) but as a
pure function over the fixed-capacity model pytrees. Multi-view (NCC/geo)
losses plug in via `gsjax.train.multiview` once regularisation kicks on.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from gsjax.model import gaussians as gm
from gsjax.ops.raster import render
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.train import losses


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss weights (OptimizationParams, arguments/__init__.py:106-118)."""
    lambda_dssim: float = 0.2
    lambda_depth_normal: float = 0.05
    lambda_mv_ncc: float = 0.6
    lambda_mv_geo: float = 0.02
    reg_on: bool = False          # iteration >= regularization_from_iter
    mv_on: bool = False           # a nearest view is available
    pixel_noise_th: float = 1.0
    patch_size: int = 3
    appearance: str = "no"        # no | gs | pgsr | gof
    # static sample_depth query budget for the multi-view geometric loss
    # (None = one query per pixel). Compaction to depth-valid in-frustum
    # pixels is loss-exact; the Trainer bumps this like the pair buffers on
    # the metrics["mv_queries"] watermark (gsjax/train/multiview.py).
    mv_query_capacity: int | None = None
    # static 16x16-block budget for the block-compacted NCC (None = dense);
    # bumped/shrunk by the Trainer on the metrics["mv_blocks"] watermark
    # like mv_query_capacity (gsjax/ops/ncc.py:warp_patch_ncc_blocks)
    ncc_block_capacity: int | None = None
    # NaN root-cause probe (GSJAX_NAN_PROBE): per-param non-finite counts for
    # grads and post-update params ride in metrics["nonfinite"] so the
    # Trainer can catch the FIRST poisoned step and dump its pre-step state.
    nan_stats: bool = False


@partial(jax.jit, static_argnames=("cfg", "loss_cfg"))
def train_step(params: gm.GaussianParams,
               aux: gm.GaussianAux,
               adam: gm.AdamState,
               camera: Camera,
               gt_image: jax.Array,
               bg: jax.Array,
               lrs: dict[str, Any],
               cfg: RasterConfig,
               loss_cfg: LossConfig,
               app_embedding: jax.Array | None = None,
               app_net: dict | None = None,
               near_cam: Camera | None = None,
               gray_r: jax.Array | None = None,
               gray_n: jax.Array | None = None):
    """One optimisation step. Returns (params, aux, adam, metrics).

    `metrics["app_grad"]` carries d(loss)/d(app_embedding) when an appearance
    model is active (the caller owns the embedding table + its optimiser).
    """

    def loss_fn(p: gm.GaussianParams, mean2d_offset: jax.Array,
                app_emb: jax.Array, app_net_: dict):
        scales, opac = gm.scaling_n_opacity_with_3d_filter(p, aux.filter_3d)
        out = render(p.xyz, scales, p.rotation, opac, gm.get_features(p),
                     camera, cfg, bg,
                     sg_axis=gm.get_sg_axis(p),
                     sg_sharpness=gm.get_sg_sharpness(p),
                     sg_color=p.sg_color,
                     alive=aux.alive,
                     mean2d_offset=mean2d_offset)
        img = out["render"]
        if loss_cfg.appearance == "gs":
            ll1 = losses.l1_appearance_gs(img, gt_image, app_emb)
        elif loss_cfg.appearance == "pgsr":
            ll1 = losses.l1_appearance_pgsr(img, gt_image, app_emb)
        elif loss_cfg.appearance == "gof":
            from gsjax.model.appearance import l1_appearance_gof
            ll1 = l1_appearance_gof(img, gt_image, app_net_, app_emb)
        else:
            ll1 = losses.l1_loss(img, gt_image)
        ssim_val = losses.ssim(img[None].squeeze(0), gt_image)
        rgb_loss = (1 - loss_cfg.lambda_dssim) * ll1 + \
            loss_cfg.lambda_dssim * (1 - ssim_val)

        dn_loss = jnp.zeros(())
        if loss_cfg.reg_on and loss_cfg.lambda_depth_normal > 0 and cfg.require_depth:
            dnormal, valid = losses.depth_to_normal(
                out["median_depth"], camera.fx, camera.fy, camera.cx, camera.cy)
            dn_loss = losses.depth_normal_loss(out["normal"], dnormal, valid)

        ncc_loss = geo_loss = jnp.zeros(())
        ncc_win_rej = jnp.zeros((), jnp.int32)
        mv_queries = jnp.zeros((), jnp.int32)
        mv_blocks = jnp.zeros((), jnp.int32)
        if (loss_cfg.reg_on and loss_cfg.mv_on and cfg.require_depth
                and (loss_cfg.lambda_mv_ncc > 0 or loss_cfg.lambda_mv_geo > 0)):
            from gsjax.train.multiview import patchmatch_losses
            (ncc_loss, geo_loss, ncc_win_rej, mv_queries,
             mv_blocks) = patchmatch_losses(
                out["median_depth"], out["normal"],
                p.xyz, scales, p.rotation, opac, aux.alive,
                camera, near_cam, gray_r, gray_n, cfg,
                loss_cfg.pixel_noise_th, loss_cfg.patch_size,
                query_capacity=loss_cfg.mv_query_capacity,
                ncc_block_capacity=loss_cfg.ncc_block_capacity)

        total = (rgb_loss + loss_cfg.lambda_depth_normal * dn_loss
                 + loss_cfg.lambda_mv_ncc * ncc_loss
                 + loss_cfg.lambda_mv_geo * geo_loss)
        metrics = dict(loss=total, l1=ll1, ssim=ssim_val, dn_loss=dn_loss,
                       ncc_loss=ncc_loss, geo_loss=geo_loss,
                       ncc_win_rej=ncc_win_rej, mv_queries=mv_queries,
                       mv_blocks=mv_blocks,
                       num_pairs=out["num_pairs"],
                       num_live_pairs=out["num_live_pairs"],
                       max_tile_count=out["max_tile_count"])
        side = dict(visibility=out["visibility"], radii=out["radii"])
        return total, (metrics, side)

    if app_embedding is None:
        app_embedding = jnp.zeros((2,))
    if app_net is None:
        app_net = {}
    zeros2d = jnp.zeros((params.capacity, 2))
    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)
    (_, (metrics, side)), (gp, g2d, g_app, g_net) = grad_fn(
        params, zeros2d, app_embedding, app_net)
    metrics["app_grad"] = g_app
    metrics["app_net_grad"] = g_net

    # dead-slot math (norms at zero, etc.) can produce NaN grads; those slots
    # carry no loss so their true gradient is zero.
    def _mask(g):
        m = aux.alive.reshape((-1,) + (1,) * (g.ndim - 1))
        return jnp.where(m, g, 0.0)
    gp = jax.tree_util.tree_map(_mask, gp)
    g2d = _mask(g2d)

    aux = gm.add_densification_stats(aux, g2d, side["visibility"],
                                     camera.width, camera.height)
    aux = dataclasses.replace(
        aux, max_radii=jnp.maximum(aux.max_radii,
                                   jnp.where(side["visibility"], side["radii"], 0)))
    params, adam = gm.adam_update(params, gp, adam, lrs)
    if loss_cfg.nan_stats:
        # number of ALIVE gaussians with any non-finite element, per field,
        # for (masked) grads and post-update params. Cheap reductions; the
        # dict rides in metrics so the Trainer reads it on its existing
        # blocking fence.
        def counts(tree):
            out = {}
            for f in dataclasses.fields(gm.GaussianParams):
                v = getattr(tree, f.name)
                bad = ~jnp.isfinite(v).reshape(v.shape[0], -1).all(axis=1)
                out[f.name] = jnp.sum(bad & aux.alive)
            return out
        metrics["nonfinite"] = {"grad": counts(gp), "param": counts(params)}
    return params, aux, adam, metrics
