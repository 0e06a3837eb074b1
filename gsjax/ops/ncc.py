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


@partial(jax.jit, static_argnames=("block_capacity", "radius", "half_step"))
def warp_patch_ncc_blocks(depth: jax.Array,
                          normal: jax.Array,
                          gray_r: jax.Array,
                          gray_n: jax.Array,
                          rel_rot: jax.Array,
                          rel_t: jax.Array,
                          intr_r: jax.Array,
                          intr_n: jax.Array,
                          sel_mask: jax.Array,
                          weights: jax.Array,
                          block_capacity: int,
                          ncc_threshold: float = 0.9,
                          radius: int = 3,
                          half_step: bool = True,
                          row_offset: jax.Array | int = 0):
    """Block-compacted NCC: homography/tap/statistic math and the Pallas
    neighbour sampler run ONLY on the 16x16 pixel blocks containing a
    `sel_mask` pixel (the PGSR d_mask — on real scenes a small fraction of
    the frame), instead of densely over every pixel.

    Per-pixel values match `warp_patch_ncc` to f32 contraction-order noise:
    reference-image taps reuse the same f32 shifted-slice blends (computed
    densely — pure bandwidth, then gathered), the neighbour taps run the
    same per-block kernel, and the NCC statistics accumulate in the same
    tap order; the homography einsum's contraction order differs between
    the [H,W] and [B,P] shapes, so uv positions differ at ulp level (losses
    agree to ~1e-5; gradients to the bf16 sampler's hat-weight
    sensitivity, ~1e-4 absolute — tests/test_loop.py).

    Returns (ncc_sum, ncc_cnt, win_rej, n_blocks): the weighted masked-sum
    terms of the PGSR NCC loss (sum over sel_mask pixels of
    where(ncc' < th & valid, ncc' * weights)), the masked count, the
    sampler-window rejection count (selected blocks only), and the
    selected-block watermark for `block_capacity` bumping."""
    import math

    barrier = jax.lax.optimization_barrier
    hp = jax.lax.Precision.HIGHEST
    hs, w = depth.shape
    h, _ = gray_r.shape
    hn, wn = gray_n.shape
    fx_r, fy_r, cx_r, cy_r = intr_r
    fx_n, fy_n, cx_n, cy_n = intr_n
    rf = radius * (0.5 if half_step else 1.0)
    blk = 16
    p = blk * blk
    hb = -(-hs // blk)
    wb = -(-w // blk)
    nb = hb * wb
    bcap = block_capacity

    # ---- block selection (same compaction pattern as the mv queries) ----
    mpad = jnp.zeros((hb * blk, wb * blk), bool).at[:hs, :w].set(sel_mask)
    blk_any = mpad.reshape(hb, blk, wb, blk).any(axis=(1, 3)).reshape(-1)
    pos = jnp.cumsum(blk_any.astype(jnp.int32)) - 1
    n_blk = pos[-1] + 1
    dst = jnp.where(blk_any & (pos < bcap), pos, bcap)
    sel = barrier(jnp.zeros((bcap,), jnp.int32).at[dst].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop"))
    slot_live = jnp.arange(bcap, dtype=jnp.int32) < jnp.minimum(n_blk, bcap)

    # ---- per-block pixel coordinates (band-local u, v) ------------------
    lane = jnp.arange(p, dtype=jnp.int32)
    u_i = (sel % wb)[:, None] * blk + (lane % blk)[None, :]     # [B,P]
    v_i = (sel // wb)[:, None] * blk + (lane // blk)[None, :]
    in_img = slot_live[:, None] & (u_i < w) & (v_i < hs)
    flat = jnp.clip(v_i, 0, hs - 1) * w + jnp.clip(u_i, 0, w - 1)
    flat_s = jnp.where(in_img, flat, 0).reshape(-1)             # [B*P]

    def gather(x2d):
        g = barrier(x2d.reshape(-1)[flat_s]).reshape(bcap, p)
        return jnp.where(in_img, g, 0.0)

    dep = gather(depth)
    nrm = jnp.stack([gather(normal[..., i]) for i in range(3)], -1)  # [B,P,3]
    wgt = jax.lax.stop_gradient(gather(weights))
    mask_c = wgt > 0

    u = u_i.astype(jnp.float32)
    v = v_i.astype(jnp.float32) + row_offset                    # global rows

    # ---- homography per compact pixel (same formulas as the dense path) --
    pn = jnp.stack([(u - cx_r) / fx_r, (v - cy_r) / fy_r,
                    jnp.ones_like(u)], -1)
    distance = -jnp.sum(pn * nrm, -1) * dep
    dist_safe = jnp.where(jnp.abs(distance) > 1e-12, distance, 1e-12)
    outer = rel_t[None, None, :, None] * nrm[:, :, None, :]
    hn_mat = rel_rot[None, None] - outer / dist_safe[..., None, None]
    k_n = jnp.array([[fx_n, 0, cx_n], [0, fy_n, cy_n], [0, 0, 1.0]])
    k_r_inv = jnp.array([[1 / fx_r, 0, -cx_r / fx_r],
                         [0, 1 / fy_r, -cy_r / fy_r], [0, 0, 1.0]])
    hmat = jnp.einsum("ij,bpjk,kl->bpil", k_n, hn_mat, k_r_inv,
                      precision=hp)                              # [B,P,3,3]
    h_uc = jnp.einsum("bpij,bpj->bpi", hmat,
                      jnp.stack([u, v, jnp.ones_like(u)], -1), precision=hp)

    step = 0.5 if half_step else 1.0
    offs = [i * step for i in range(-radius, radius + 1)]
    n_off = len(offs)
    all_inside = ((u - rf > 0) & (u + rf < w - 1)
                  & (v - rf > 0) & (v + rf < h - 1))

    # ---- reference taps: exact dense slice blends, ONE row gather --------
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

    # [hs, w, K] tap-last so the gather is one wide-row pass
    c_r_dense = jnp.stack([c_r_tap(du, dv) for dv in offs for du in offs],
                          axis=-1)
    c_r_k = barrier(
        c_r_dense.reshape(-1, n_off * n_off)[flat_s]).reshape(
            bcap, p, n_off * n_off)
    c_r_k = jnp.where(in_img[..., None], c_r_k, 0.0)

    # ---- neighbour taps through the pre-blocked kernel -------------------
    du_k = jnp.asarray([du for dv in offs for du in offs])[None, :, None]
    dv_k = jnp.asarray([dv for dv in offs for du in offs])[None, :, None]
    num_u = h_uc[..., 0][:, None, :] \
        + du_k * hmat[..., 0, 0][:, None, :] \
        + dv_k * hmat[..., 0, 1][:, None, :]                     # [B,K,P]
    num_v = h_uc[..., 1][:, None, :] + du_k * hmat[..., 1, 0][:, None, :] \
        + dv_k * hmat[..., 1, 1][:, None, :]
    den = h_uc[..., 2][:, None, :] + du_k * hmat[..., 2, 0][:, None, :] \
        + dv_k * hmat[..., 2, 1][:, None, :]
    den = jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    # dead lanes (slot padding / out-of-band pixels in partial edge blocks)
    # carry garbage homographies whose tap positions would blow up the
    # kernel's per-block bounding window and reject the block's REAL taps —
    # pin them to the block's min real tap (window unchanged; content is
    # masked via in_img anyway)
    live3 = in_img[:, None, :]
    un_raw = num_u / den
    vn_raw = num_v / den
    pin_u = jnp.min(jnp.where(live3, un_raw, jnp.inf), axis=(1, 2))
    pin_v = jnp.min(jnp.where(live3, vn_raw, jnp.inf), axis=(1, 2))
    pin_u = jnp.where(jnp.isfinite(pin_u), pin_u, 0.0)[:, None, None]
    pin_v = jnp.where(jnp.isfinite(pin_v), pin_v, 0.0)[:, None, None]
    un_k = jnp.where(live3, un_raw, pin_u)
    vn_k = jnp.where(live3, vn_raw, pin_v)
    inside_k = ((un_k - rf > 0) & (un_k + rf < wn - 1)
                & (vn_k - rf > 0) & (vn_k + rf < hn - 1))
    all_inside = all_inside & jnp.all(inside_k, axis=1)

    from gsjax.ops.warp_sample import warp_sample_blocks
    if _use_pallas_sampler():
        c_n_k, ok = warp_sample_blocks(gray_n, un_k, vn_k,
                                       jax.default_backend() != "tpu")
        win_rej = jnp.sum((all_inside & ~ok & in_img).astype(jnp.int32))
        all_inside = all_inside & ok
    else:
        c_n_k = jax.vmap(lambda uu, vv: _bilinear(gray_n, uu, vv),
                         in_axes=1, out_axes=1)(un_k, vn_k)
        win_rej = jnp.zeros((), jnp.int32)

    # ---- NCC statistics (same accumulation order over taps) --------------
    c_n_t = jnp.transpose(c_n_k, (0, 2, 1))                      # [B,P,K]
    stats = jnp.zeros((5, bcap, p))
    for k in range(n_off * n_off):
        c_r = c_r_k[..., k]
        c_n = c_n_t[..., k]
        stats = stats + jnp.stack(
            [c_r, c_n, c_r * c_r, c_n * c_n, c_r * c_n])
    total = float(n_off * n_off)
    s_r, s_n, s_r2, s_n2, s_rn = stats
    cross = s_rn - s_r * s_n / total
    var_r = s_r2 - s_r * s_r / total
    var_n = s_n2 - s_n * s_n / total
    ncc2 = cross * cross / (var_r * var_n + 1e-8)
    valid = all_inside & (var_r > 5e-6) & (var_n > 5e-6) & in_img
    nccv = jnp.clip(1.0 - jnp.where(valid, ncc2, 0.0), 0.0, 2.0)
    ncc_mask = jax.lax.stop_gradient(
        (nccv < ncc_threshold) & valid & mask_c)
    ncc_cnt = jnp.sum(ncc_mask)
    ncc_sum = jnp.sum(jnp.where(ncc_mask, nccv * wgt, 0.0))
    return ncc_sum, ncc_cnt, win_rej, n_blk
