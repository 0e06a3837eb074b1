"""Pallas blend kernel vs XLA reference path parity (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.ops.raster import RasterConfig, render
from gsjax.ops.raster import render_pallas, render_ref
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.preprocess import preprocess
from tests.util import look_at_camera, random_gaussians


def run_pallas(width=96, height=64, n=150, seed=3, require_depth=True):
    means, scales, q, op, shs = random_gaussians(n, seed=seed)
    cam = look_at_camera(width=width, height=height)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=2, require_depth=require_depth)
    prep = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                      jnp.asarray(op), jnp.asarray(shs), None, None, None,
                      cam, cfg)
    binning = bin_gaussians(prep, cfg, width, height)
    feats = render_ref.prepare_pairs(prep, binning, cfg)
    tiles_x, tiles_y = cfg.grid(width, height)
    n_tiles = tiles_x * tiles_y
    feats_t = render_pallas.pack_features_t(feats, cfg)
    cam_params = jnp.asarray([cam.fx, cam.fy, 0.0, 0.0, 0.0,
                              width, height, 0.0], jnp.float32)
    out = render_pallas.blend_all_tiles(
        feats_t, binning.tile_start, binning.tile_count, cam_params, cfg,
        tiles_x, n_tiles, interpret=True)

    ref = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(op), jnp.asarray(shs), cam, cfg, jnp.zeros(3))
    return out, ref, cfg, (tiles_x, tiles_y)


def tiles_to_image(rows, tiles_x, tiles_y, width, height, cfg):
    t = cfg.tile
    v = rows.reshape(tiles_y, tiles_x, t, t)
    v = np.moveaxis(v, 2, 1).reshape(tiles_y * t, tiles_x * t)
    return v[:height, :width]


@pytest.mark.slow
def test_pallas_blend_matches_ref():
    out, ref, cfg, (tiles_x, tiles_y) = run_pallas()
    out = np.asarray(out)        # [T, P, 16]
    w, h = 96, 64
    ch = lambda c: tiles_to_image(out[:, :, c], tiles_x, tiles_y, w, h, cfg)
    img = np.stack([ch(c) for c in range(3)], -1)
    np.testing.assert_allclose(img, np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(ch(6), np.asarray(ref["alpha"]), atol=2e-5)
    nrm = np.stack([ch(3 + c) for c in range(3)], -1)
    np.testing.assert_allclose(nrm, np.asarray(ref["normal"]), atol=1e-4)
    md = ch(7)
    ref_md = np.asarray(ref["median_depth"])
    close = np.isclose(md, ref_md, atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.999, f"median depth mismatch {(~close).mean():.3%}"
    assert (ch(8) == np.asarray(ref["n_contrib"])).mean() > 0.999
