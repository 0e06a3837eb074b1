"""Parity of the XLA renderer against the brute-force numpy oracle."""

import jax.numpy as jnp
import numpy as np

from gsjax.ops.raster import RasterConfig, render
from tests.oracle import preprocess_np, render_np
from tests.util import look_at_camera, random_gaussians


def run_both(n=120, seed=3, width=96, height=64, kernel_size=0.0, bg=(0, 0, 0),
             sh_degree=2, require_depth=True):
    means, scales, q, op, shs = random_gaussians(n, seed=seed)
    cam = look_at_camera(width=width, height=height)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=sh_degree,
                       kernel_size=kernel_size, require_depth=require_depth)
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(op), jnp.asarray(shs), cam, cfg,
                 jnp.asarray(np.asarray(bg, np.float32)))
    prep = preprocess_np(means, scales, q, op, shs, cam, sh_degree,
                         kernel_size=kernel_size)
    ref = render_np(prep, cam, np.asarray(bg), require_depth=require_depth)
    return out, ref


def test_color_alpha_parity():
    out, ref = run_both()
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref["alpha"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=5e-4, rtol=1e-3)
    assert (np.asarray(out["n_contrib"]) == ref["n_contrib"]).mean() > 0.999


def test_normal_parity():
    out, ref = run_both()
    np.testing.assert_allclose(np.asarray(out["normal"]), ref["normal"],
                               atol=1e-3, rtol=1e-3)


def test_median_depth_parity():
    out, ref = run_both()
    got = np.asarray(out["median_depth"])
    want = ref["median_depth"]
    # bisection involves >=/<= 0.5 branch decisions; allow tiny fraction of
    # pixels to disagree near the decision boundary, rest must match closely.
    close = np.isclose(got, want, atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.995, f"median depth mismatch on {(~close).mean():.2%} pixels"


def test_mip_kernel_size_parity():
    out, ref = run_both(kernel_size=0.3, seed=11)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=5e-4, rtol=1e-3)


def test_white_background():
    out, ref = run_both(bg=(1, 1, 1), seed=5)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=5e-4, rtol=1e-3)


def test_spherical_gaussian_parity():
    """SG colour lobes (sg_degree > 0) match the float64 oracle — the
    mip360 recipe path (--sg_degree 7, scripts/mip360.sh)."""
    n, sg_deg = 80, 3
    means, scales, q, op, shs = random_gaussians(n, seed=9)
    rng = np.random.default_rng(10)
    sg_axis = rng.normal(0, 1, (n, sg_deg, 3)).astype(np.float32)
    # render() takes post-activation params: unit axes (gm.get_sg_axis) and
    # post-softplus sharpness
    sg_axis /= np.linalg.norm(sg_axis, axis=2, keepdims=True)
    sg_sharpness = rng.uniform(1.0, 6.0, (n, sg_deg)).astype(np.float32)
    sg_color = (0.3 * rng.normal(0, 1, (n, sg_deg, 3))).astype(np.float32)
    cam = look_at_camera(width=96, height=64)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=2, sg_degree=sg_deg,
                       require_depth=False)
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(op), jnp.asarray(shs), cam, cfg, jnp.zeros(3),
                 sg_axis=jnp.asarray(sg_axis),
                 sg_sharpness=jnp.asarray(sg_sharpness),
                 sg_color=jnp.asarray(sg_color))
    prep = preprocess_np(means, scales, q, op, shs, cam, 2,
                         sg_axis=sg_axis, sg_sharpness=sg_sharpness,
                         sg_color=sg_color, sg_degree=sg_deg)
    ref = render_np(prep, cam, np.zeros(3), require_depth=False)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=1e-3, rtol=2e-3)
