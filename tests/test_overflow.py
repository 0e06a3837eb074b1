"""Tile overflow semantics: pairs past max_per_tile must be dead everywhere.

Before monitor_capacity bumps the cap, a densification jump can push a tile's
pair count past max_per_tile. The blend kernels clamp their marching at the
cap (render_pallas.py), so overflow slots are never rendered NOR gradient-
written; binning must therefore mark them pair_valid=False or the backward
scatter would add uninitialized HBM into real gaussian gradients (ADVICE r1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops.raster import RasterConfig, render
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.preprocess import preprocess
from tests.util import look_at_camera, random_gaussians


def overflow_scene(n=420, seed=7):
    """All gaussians in a narrow cone -> a few tiles hold every pair."""
    means, scales, q, op, shs = random_gaussians(n, seed=seed, spread=0.18)
    op = np.full_like(op, 0.02)  # low alpha: no early exit, full list marched
    cam = look_at_camera(width=96, height=64)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=128, sh_degree=1, require_depth=True)
    return means, scales, q, op, shs[:, :4], cam, cfg


def test_pair_valid_clamped_at_max_per_tile():
    means, scales, q, op, shs, cam, cfg = overflow_scene()
    prep = preprocess(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                      jnp.asarray(op), jnp.asarray(shs), None, None, None,
                      cam, cfg, None)
    binning = bin_gaussians(prep, cfg, cam.width, cam.height)
    assert int(binning.max_tile_count) > cfg.max_per_tile, \
        "scene must actually overflow for this test to bite"
    starts = np.asarray(binning.tile_start)
    counts = np.asarray(binning.tile_count)
    valid = np.asarray(binning.pair_valid)
    for t in range(starts.shape[0]):
        width = -(-counts[t] // cfg.align) * cfg.align
        n_valid = int(valid[starts[t]:starts[t] + width].sum())
        assert n_valid == min(int(counts[t]), cfg.max_per_tile), \
            f"tile {t}: {n_valid} valid slots vs count {counts[t]}"


def _grads(backend, means, scales, q, op, shs, cam, cfg):
    cfg = dataclasses.replace(cfg, backend=backend)

    def loss(ms, sc, qq, oo, sh):
        out = render(ms, sc, qq, oo, sh, cam, cfg, jnp.zeros(3))
        return (jnp.sum(out["render"] ** 2) + jnp.sum(out["alpha"])
                + jnp.sum(out["normal"] ** 2))

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(op), jnp.asarray(shs))


def test_overflow_gradients_parity():
    """Pallas (interpret) and ref backends agree under tile overflow, and the
    gradients are finite — overflow slots contribute exactly nothing."""
    means, scales, q, op, shs, cam, cfg = overflow_scene()
    g_ref = _grads("ref", means, scales, q, op, shs, cam, cfg)
    g_pal = _grads("pallas", means, scales, q, op, shs, cam, cfg)
    for a, b in zip(g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)
