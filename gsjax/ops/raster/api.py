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

from gsjax.ops.raster import render_ref
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import preprocess


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
        "max_tile_count": binning.max_tile_count,
    }
