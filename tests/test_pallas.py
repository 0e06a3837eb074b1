"""Pallas blend kernels vs XLA reference path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.ops.raster import RasterConfig, render
from tests.util import look_at_camera, random_gaussians

W, H = 96, 64


def setup(n=150, seed=3, require_depth=True):
    means, scales, q, op, shs = random_gaussians(n, seed=seed)
    cam = look_at_camera(width=W, height=H)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=2,
                       require_depth=require_depth)
    args = tuple(map(jnp.asarray, (means, scales, q, op, shs)))
    return args, cam, cfg


def render_with(backend, args, cam, cfg, bg=None):
    cfg = dataclasses.replace(cfg, backend=backend)
    bg = jnp.zeros(3) if bg is None else bg
    return render(*args, cam, cfg, bg)


@pytest.mark.slow
def test_pallas_forward_matches_ref():
    args, cam, cfg = setup()
    bg = jnp.asarray([0.2, 0.1, 0.4])
    out_p = render_with("pallas", args, cam, cfg, bg)
    out_r = render_with("ref", args, cam, cfg, bg)
    np.testing.assert_allclose(out_p["render"], out_r["render"], atol=3e-5)
    np.testing.assert_allclose(out_p["alpha"], out_r["alpha"], atol=3e-5)
    np.testing.assert_allclose(out_p["normal"], out_r["normal"], atol=2e-4)
    md_p, md_r = np.asarray(out_p["median_depth"]), np.asarray(out_r["median_depth"])
    close = np.isclose(md_p, md_r, atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.995, f"median depth mismatch {(~close).mean():.3%}"
    assert (np.asarray(out_p["n_contrib"]) == np.asarray(out_r["n_contrib"])).mean() > 0.999


@pytest.mark.slow
def test_pallas_backward_matches_ref():
    args, cam, cfg = setup(n=120, seed=5)
    rng = np.random.default_rng(0)
    wc = jnp.asarray(rng.normal(0, 1, (H, W, 3)).astype(np.float32))
    wn = jnp.asarray(rng.normal(0, 1, (H, W, 3)).astype(np.float32))
    wa = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))
    wm = jnp.asarray(rng.normal(0, 1, (H, W)).astype(np.float32))

    def loss(backend, parts, *a):
        out = render_with(backend, a, cam, cfg)
        term = 0.0
        if "c" in parts:
            term += jnp.sum(out["render"] * wc)
        if "n" in parts:
            term += jnp.sum(out["normal"] * wn)
        if "a" in parts:
            term += jnp.sum(out["alpha"] * wa)
        if "m" in parts:
            term += jnp.sum(out["median_depth"] * wm)
        return term

    # color/alpha/normal grads: exact same math -> tight tolerance
    for parts in ("c", "a", "n"):
        gp = jax.grad(lambda *a: loss("pallas", parts, *a), argnums=(0, 1, 2, 3, 4))(*args)
        gr = jax.grad(lambda *a: loss("ref", parts, *a), argnums=(0, 1, 2, 3, 4))(*args)
        for i, (p, r) in enumerate(zip(gp, gr)):
            p, r = np.asarray(p), np.asarray(r)
            scale = np.abs(r).max() + 1e-8
            np.testing.assert_allclose(p / scale, r / scale, atol=2e-4,
                                       err_msg=f"parts={parts} arg{i}")

    # median-depth grads cannot be checked against the ref backend: autodiff
    # through the finite bisection's (t0-0.5)/(t0-t1) interpolation is f32
    # catastrophic-cancellation noise. Ground truth is the float64 oracle
    # below (test_pallas_median_grad_matches_oracle).


@pytest.mark.slow
def test_pallas_median_grad_matches_oracle():
    """The hand-written implicit-function median-depth VJP vs float64 FD of
    the true root of T(t)=0.5 (oracle with a near-exact 20-iter bisection)."""
    from tests import oracle

    w, h = 64, 32
    means, scales, q, op, shs = random_gaussians(60, seed=5)
    cam = look_at_camera(width=w, height=h)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 12,
                       max_per_tile=256, sh_degree=2, require_depth=True,
                       backend="pallas")
    args = tuple(map(jnp.asarray, (means, scales, q, op, shs)))
    rng = np.random.default_rng(0)

    def oracle_md(*a):
        prep = oracle.preprocess_np(*a, cam, 2)
        return oracle.render_np(prep, cam, np.zeros(3), require_depth=True,
                                split_iters=20)["median_depth"]

    vs = [rng.normal(0, 1, np.asarray(a).shape) for a in args]
    eps = 1e-5
    b64 = [np.asarray(a, np.float64) for a in (means, scales, q, op, shs)]
    mp = oracle_md(*[a + eps * v for a, v in zip(b64, vs)])
    mm = oracle_md(*[a - eps * v for a, v in zip(b64, vs)])
    dm = (mp - mm) / (2 * eps)
    stable = np.abs(mp - mm) < 1e-3     # mask discrete per-pixel events
    assert stable.mean() > 0.98
    wm = rng.normal(0, 1, (h, w)) * stable
    fd = float(np.sum(dm * wm))

    def loss(*a):
        out = render(*a, cam, cfg, jnp.zeros(3))
        return jnp.sum(out["median_depth"] * jnp.asarray(wm, jnp.float32))

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    an = sum(float(np.sum(np.asarray(gi, np.float64) * vi))
             for gi, vi in zip(g, vs))
    assert abs(an - fd) / (abs(fd) + 1e-9) < 0.08, (an, fd)


@pytest.mark.slow
def test_pallas_no_depth_matches_ref():
    args, cam, cfg = setup(require_depth=False)
    out_p = render_with("pallas", args, cam, cfg)
    out_r = render_with("ref", args, cam, cfg)
    np.testing.assert_allclose(out_p["render"], out_r["render"], atol=3e-5)
    np.testing.assert_allclose(out_p["alpha"], out_r["alpha"], atol=3e-5)
