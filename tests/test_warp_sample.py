"""The Pallas irregular bilinear sampler (gsjax/ops/warp_sample.py) vs the
gather-based reference, values and gradients, plus the NCC integration."""

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops import ncc as N
from gsjax.ops.ncc import _bilinear
from gsjax.ops.warp_sample import warp_sample


def _coherent_warp(h, w, k=3):
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    un = np.stack([uu + 3.3 + 0.01 * vv, uu + 3.8, uu + 2.9][:k])
    vn = np.stack([vv + 1.2, vv + 1.7 + 0.005 * uu, vv + 0.9][:k])
    return jnp.asarray(un.astype(np.float32)), jnp.asarray(vn.astype(np.float32))


def test_warp_sample_matches_bilinear():
    rng = np.random.default_rng(1)
    h, w = 40, 56
    img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    un, vn = _coherent_warp(h, w)
    val, ok = warp_sample(img, un, vn, True)
    ref = jax.vmap(lambda u, v: _bilinear(img, u, v))(un, vn)
    okm = np.asarray(ok) & (np.asarray(un).max(0) < w - 1) \
        & (np.asarray(vn).max(0) < h - 1)
    assert np.asarray(ok).mean() == 1.0     # smooth warp: every tap in-window
    d = np.abs(np.asarray(val) - np.asarray(ref))[:, okm]
    assert d.max() < 5e-3, d.max()          # bf16 region quantisation


def test_warp_sample_grads_match_ref_autodiff():
    rng = np.random.default_rng(2)
    h, w = 40, 56
    img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    un, vn = _coherent_warp(h, w)
    okm = np.ones((h, w), bool)
    okm[:, -6:] = False
    okm[-4:, :] = False
    okm = jnp.asarray(okm)

    def f(u, v):
        return jnp.sum(jnp.where(okm[None], warp_sample(img, u, v, True)[0],
                                 0.0))

    def fr(u, v):
        return jnp.sum(jnp.where(
            okm[None], jax.vmap(lambda a, b: _bilinear(img, a, b))(u, v), 0.0))

    g = jax.grad(f, argnums=(0, 1))(un, vn)
    gr = jax.grad(fr, argnums=(0, 1))(un, vn)
    for a, b in zip(g, gr):
        d = np.abs(np.asarray(a) - np.asarray(b))[:, np.asarray(okm)]
        assert d.max() < 8e-3, d.max()


def test_ncc_pallas_backend_matches_ref():
    """End-to-end warp_patch_ncc: pallas sampler vs gather path (values and
    d{depth,normal} grads at bf16-sampling tolerance)."""
    raw = N.warp_patch_ncc.__wrapped__
    rng = np.random.default_rng(0)
    h, w = 48, 64
    depth = jnp.asarray((3 + rng.normal(0, .05, (h, w))).astype(np.float32))
    nrm = np.concatenate([rng.normal(0, .05, (h, w, 2)),
                          -np.ones((h, w, 1))], -1)
    nrm = jnp.asarray((nrm / np.linalg.norm(nrm, axis=-1, keepdims=True))
                      .astype(np.float32))
    gr_ = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    gn = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    th = 0.03
    rel_r = jnp.asarray(np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32))
    rel_t = jnp.asarray(np.array([0.05, 0, 0], np.float32))
    intr = (40.0, 40.0, w / 2, h / 2)

    old = N._NCC_BACKEND
    try:
        N._NCC_BACKEND = "ref"
        cc0, v0 = raw(depth, nrm, gr_, gn, rel_r, rel_t, intr, intr)
        N._NCC_BACKEND = "pallas"
        cc1, v1 = raw(depth, nrm, gr_, gn, rel_r, rel_t, intr, intr)
        m = np.asarray(v0) & np.asarray(v1)
        assert m.sum() > 1000
        d = np.abs(np.asarray(cc0) - np.asarray(cc1))[m]
        assert d.max() < 8e-3, d.max()

        def gfn(dd, nm):
            return jnp.sum(jnp.where(
                jnp.asarray(m),
                raw(dd, nm, gr_, gn, rel_r, rel_t, intr, intr)[0], 0.0))

        N._NCC_BACKEND = "pallas"
        g0 = jax.grad(gfn, argnums=(0, 1))(depth, nrm)
        N._NCC_BACKEND = "ref"
        g1 = jax.grad(gfn, argnums=(0, 1))(depth, nrm)
        for a, b in zip(g0, g1):
            gd = np.abs(np.asarray(a) - np.asarray(b)).max()
            scale = np.abs(np.asarray(b)).max() + 1e-9
            assert gd / scale < 3e-2, (gd, scale)
    finally:
        N._NCC_BACKEND = old
