"""Patch-warped NCC photometric consistency.

Equivalent of the `warp-patch-ncc` CUDA submodule
(warp_patch_ncc_impl.cu:18-255): for each query pixel with an estimated depth
and normal, build the plane-induced homography

    H = K_n (R - T n^T / distance) K_r^{-1},  distance = -n . (depth * K_r^{-1} uv)

warp a (2R+1)^2 patch at half-pixel steps into the neighbour view, and compute
the *squared* normalised cross-correlation between the bilinear-sampled ref
and neighbour patches. The reference hand-codes forward-mode gradients wrt
depth/normal; here the whole computation is a differentiable JAX function and
autodiff supplies them.

Dense formulation: operates on all pixels at once with a validity mask
(instead of gather/compact with dynamic shapes), which is the TPU-friendly
layout for the PatchMatch loss.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

_NCC_BACKEND = os.environ.get("GSJAX_NCC_BACKEND", "auto")


def _use_pallas_sampler() -> bool:
    if _NCC_BACKEND == "ref":
        return False
    if _NCC_BACKEND == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _bilinear(img, u, v):
    """img: [H,W]; u,v: [...] pixel coords (clamped, floor/ceil weights as in
    the CUDA kernel)."""
    h, w = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    u1f = u0 + 1.0
    v1f = v0 + 1.0
    wu1 = u - u0
    wv1 = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, w - 1)
    u1i = jnp.clip(u1f.astype(jnp.int32), 0, w - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
    v1i = jnp.clip(v1f.astype(jnp.int32), 0, h - 1)
    c00 = img[v0i, u0i]
    c01 = img[v0i, u1i]
    c10 = img[v1i, u0i]
    c11 = img[v1i, u1i]
    return ((1 - wv1) * ((1 - wu1) * c00 + wu1 * c01)
            + wv1 * ((1 - wu1) * c10 + wu1 * c11))


@partial(jax.jit, static_argnames=("radius", "half_step", "with_stats"))
def warp_patch_ncc(depth: jax.Array,
                   normal: jax.Array,
                   gray_r: jax.Array,
                   gray_n: jax.Array,
                   rel_rot: jax.Array,
                   rel_t: jax.Array,
                   intr_r: jax.Array,
                   intr_n: jax.Array,
                   radius: int = 3,
                   half_step: bool = True,
                   row_offset: jax.Array | int = 0,
                   with_stats: bool = False):
    """Dense NCC^2 over the reference image (or a horizontal band of it).

    Args:
      depth: [Hs,W] per-pixel depth in the ref view (z-depth); may be a
        row band starting at `row_offset` of the full frame (sharded use).
      normal: [Hs,W,3] camera-space unit normals (ref view).
      gray_r/gray_n: [H,W] FULL luma images (patch taps read globally).
      rel_rot: [3,3] ref-cam -> neighbour-cam rotation; rel_t: [3].
      intr_r/intr_n: (fx, fy, cx, cy).
      with_stats: also return the count of pixels rejected ONLY by the
        Pallas sampler's per-block window (geometrically valid taps past the
        RU_E contraction width) — the observability asked for in ADVICE r4:
        a large count flags extreme homographies silently losing NCC signal.

    Returns (ncc [Hs,W] squared correlation in [0,1], valid [Hs,W] bool
    [, win_rejected count scalar when with_stats]).
    """
    hs, w = depth.shape
    h, _ = gray_r.shape
    hn, wn = gray_n.shape
    fx_r, fy_r, cx_r, cy_r = intr_r
    fx_n, fy_n, cx_n, cy_n = intr_n
    rf = radius * (0.5 if half_step else 1.0)

    u = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(hs, 0)
    v = (jnp.arange(hs, dtype=jnp.float32) + row_offset)[:, None].repeat(w, 1)
    pn = jnp.stack([(u - cx_r) / fx_r, (v - cy_r) / fy_r, jnp.ones_like(u)], -1)
    distance = -jnp.sum(pn * normal, -1) * depth                  # [H,W]
    dist_safe = jnp.where(jnp.abs(distance) > 1e-12, distance, 1e-12)

    # H = K_n (R - T n^T / distance) K_r^{-1}, per pixel
    # outer = T n^T: [H,W,3,3]
    outer = rel_t[None, None, :, None] * normal[:, :, None, :]
    hn_mat = rel_rot[None, None] - outer / dist_safe[..., None, None]
    k_n = jnp.array([[fx_n, 0, cx_n], [0, fy_n, cy_n], [0, 0, 1.0]])
    k_r_inv = jnp.array([[1 / fx_r, 0, -cx_r / fx_r],
                         [0, 1 / fy_r, -cy_r / fy_r], [0, 0, 1.0]])
    hmat = jnp.einsum("ij,hwjk,kl->hwil", k_n, hn_mat, k_r_inv,
                      precision=jax.lax.Precision.HIGHEST)        # [H,W,3,3]

    step = 0.5 if half_step else 1.0
    offs = [i * step for i in range(-radius, radius + 1)]
    n_off = len(offs)

    h_uc = jnp.einsum("hwij,hwj->hwi", hmat,
                      jnp.stack([u, v, jnp.ones_like(u)], -1),
                      precision=jax.lax.Precision.HIGHEST)        # [H,W,3]

    # Reference-image taps sit on a REGULAR grid (constant offsets du, dv):
    # bilinear at a constant fractional offset is a fixed 2/4-coefficient
    # blend of integer-shifted images — pure slices, no gather. The old
    # per-tap _bilinear(gray_r, u+du, v+dv) alone cost ~4s/step at 1080p
    # (49 taps x 4 corners x 2M scalar gathers). Edge-padding reproduces the
    # CUDA kernel's index clamping.
    import math

    pad = int(math.ceil(rf)) + 1
    gr_pad = jnp.pad(gray_r, pad, mode="edge")
    row0 = jnp.asarray(row_offset, jnp.int32)

    def shifted_r(iv, iu):
        return jax.lax.dynamic_slice(
            gr_pad, (pad + row0 + iv, jnp.int32(pad + iu)), (hs, w))

    def c_r_tap(du, dv):
        u0, fu = math.floor(du), du - math.floor(du)
        v0, fv = math.floor(dv), dv - math.floor(dv)
        out = 0.0
        for iv, wv_ in ((v0, 1.0 - fv), (v0 + 1, fv)):
            for iu, wu_ in ((u0, 1.0 - fu), (u0 + 1, fu)):
                if wv_ * wu_ != 0.0:
                    out = out + (wv_ * wu_) * shifted_r(iv, iu)
        return out

    stats = jnp.zeros((5, hs, w))
    all_inside = ((u - rf > 0) & (u + rf < w - 1)
                  & (v - rf > 0) & (v + rf < h - 1))

    # neighbour-tap positions for ALL taps, [K, Hs, W] (the homography is
    # applied per tap; division per tap as in warp_patch_ncc_impl.cu:90-110)
    du_k = jnp.asarray([du for dv in offs for du in offs])[:, None, None]
    dv_k = jnp.asarray([dv for dv in offs for du in offs])[:, None, None]
    num_u = h_uc[None, ..., 0] + du_k * hmat[None, ..., 0, 0] \
        + dv_k * hmat[None, ..., 0, 1]
    num_v = h_uc[None, ..., 1] + du_k * hmat[None, ..., 1, 0] \
        + dv_k * hmat[None, ..., 1, 1]
    den = h_uc[None, ..., 2] + du_k * hmat[None, ..., 2, 0] \
        + dv_k * hmat[None, ..., 2, 1]
    den = jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    un_k = num_u / den
    vn_k = num_v / den
    inside_k = ((un_k - rf > 0) & (un_k + rf < wn - 1)
                & (vn_k - rf > 0) & (vn_k + rf < hn - 1))
    all_inside = all_inside & jnp.all(inside_k, axis=0)

    if _use_pallas_sampler():
        # Pallas block sampler: ~8.3 s of XLA gathers -> one MXU kernel
        # (gsjax/ops/warp_sample.py). `ok` adds an in-window condition for
        # extreme warps (taps a caller would reject geometrically anyway).
        from gsjax.ops.warp_sample import warp_sample
        c_n_k, ok = warp_sample(gray_n, un_k, vn_k,
                                jax.default_backend() != "tpu")
        win_rejected = jnp.sum((all_inside & ~ok).astype(jnp.int32))
        all_inside = all_inside & ok
    else:
        c_n_k = jax.vmap(lambda uu, vv: _bilinear(gray_n, uu, vv))(un_k, vn_k)
        win_rejected = jnp.zeros((), jnp.int32)

    k = 0
    for dv in offs:
        for du in offs:
            c_r = c_r_tap(du, dv)
            c_n = c_n_k[k]
            k += 1
            stats = stats + jnp.stack(
                [c_r, c_n, c_r * c_r, c_n * c_n, c_r * c_n])

    total = float(n_off * n_off)
    s_r, s_n, s_r2, s_n2, s_rn = stats
    cross = s_rn - s_r * s_n / total
    var_r = s_r2 - s_r * s_r / total
    var_n = s_n2 - s_n * s_n / total
    ncc = cross * cross / (var_r * var_n + 1e-8)
    valid = all_inside & (var_r > 5e-6) & (var_n > 5e-6)
    if with_stats:
        return jnp.where(valid, ncc, 0.0), valid, win_rejected
    return jnp.where(valid, ncc, 0.0), valid
