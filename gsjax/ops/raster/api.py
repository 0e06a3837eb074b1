"""Rasterizer facade: preprocess -> binning -> tile blend.

Functional equivalent of `GaussianRasterizer.forward` + `render()`
(diff_gaussian_rasterization/__init__.py:272-483, gaussian_renderer/__init__.py:18-98),
returning channels-last images. Fully differentiable via XLA autodiff; the
`mean2d_offset` argument is a zero-valued gradient tap so the train step can
read d(loss)/d(mean2d) for GOF densification statistics (the reference gets
this from `screenspace_points.grad`, gaussian_renderer/__init__.py:28-31).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.ops.raster import render_pallas, render_ref
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import preprocess


def _use_pallas(cfg: RasterConfig) -> bool:
    if cfg.backend == "ref":
        return False
    if cfg.backend == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _render_tiles_pallas(prep, binning, camera: Camera, cfg: RasterConfig,
                         bg: jax.Array):
    """Hand-written Pallas fwd+bwd blend; returns the render_ref image dict."""
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    n_tiles = tiles_x * tiles_y
    interpret = jax.default_backend() != "tpu"
    feats = render_ref.prepare_pairs(prep, binning, cfg)
    feats_t = render_pallas.pack_features_t(feats, cfg)
    cam_params = jnp.concatenate([
        jnp.asarray([camera.fx, camera.fy], jnp.float32),
        bg.astype(jnp.float32).reshape(3),
        jnp.asarray([camera.width, camera.height, 0.0], jnp.float32)])
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    out = render_pallas.blend_pallas(
        feats_t, tile_ids, binning.tile_start, binning.tile_count, cam_params,
        cfg, tiles_x, n_tiles, interpret)

    def img(rows, grad=True):
        v = rows if grad else jax.lax.stop_gradient(rows)
        return render_ref._assemble(
            jnp.moveaxis(v, 1, -1) if v.ndim == 3 else v,
            tiles_x, tiles_y, camera.width, camera.height, cfg)

    return {
        "color": img(out[:, 0:3, :]),
        "normal": img(out[:, 3:6, :]),
        "alpha": img(out[:, 6, :]),
        "median_depth": img(out[:, 7, :]),
        "n_contrib": img(out[:, 8, :], grad=False).astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("cfg",))
def mark_visible(means3d: jax.Array, camera: Camera,
                 cfg: RasterConfig = RasterConfig()) -> jax.Array:
    """[N] bool frustum visibility of gaussian centres — the viewer's
    coarse cull (`markVisible`, rasterizer_impl.cu:214-233, ext.cpp:22;
    in_frustum test auxiliary.h:133-153: view-space z > 0.2)."""
    wv = camera.world_view
    z = means3d @ wv[2, :3] + wv[2, 3]
    return z > cfg.near_plane


@partial(jax.jit, static_argnames=("cfg",))
def render(means3d: jax.Array,
           scales: jax.Array,
           rotations: jax.Array,
           opacities: jax.Array,
           shs: jax.Array,
           camera: Camera,
           cfg: RasterConfig,
           bg: jax.Array,
           sg_axis: jax.Array | None = None,
           sg_sharpness: jax.Array | None = None,
           sg_color: jax.Array | None = None,
           alive: jax.Array | None = None,
           mean2d_offset: jax.Array | None = None):
    """Render one view.

    Args:
      means3d: [N,3]; scales/opacities post-activation (3D-filtered);
      rotations: [N,4] raw quaternions; shs: [N,M,3].
      camera, cfg: static-shaped camera + config.
      bg: [3] background colour.
      alive: [N] bool mask for padded model slots.
      mean2d_offset: [N,2] zeros; gradient tap for densification stats.

    Returns dict:
      render [H,W,3], alpha [H,W], normal [H,W,3], median_depth [H,W],
      n_contrib [H,W], radii [N], visibility [N] bool, num_pairs, max_tile_count.
    """
    prep = preprocess(means3d, scales, rotations, opacities, shs,
                      sg_axis, sg_sharpness, sg_color, camera, cfg, alive)
    if mean2d_offset is not None:
        prep = dataclasses.replace(prep, mean2d=prep.mean2d + mean2d_offset)
    binning = bin_gaussians(prep, cfg, camera.width, camera.height)
    if _use_pallas(cfg):
        images = _render_tiles_pallas(prep, binning, camera, cfg, bg)
    else:
        images = render_ref.render_tiles(prep, binning, camera, cfg, bg)
    return {
        "render": images["color"],
        "alpha": images["alpha"],
        "normal": images["normal"],
        "median_depth": images["median_depth"],
        "n_contrib": images["n_contrib"],
        "radii": prep.radius,
        "visibility": prep.radius > 0,
        "num_pairs": binning.num_pairs,
        "num_live_pairs": binning.num_live,
        "max_tile_count": binning.max_tile_count,
    }
