"""Pallas TPU irregular bilinear image sampler (the NCC warp hot op).

`warp_patch_ncc` needs gray_n sampled at 49 homography-warped positions per
reference pixel. As XLA gathers that costs ~8.3 s/step at 1080p (measured
2026-08-19, REG_PROFILE.json: 49 taps x 4 corners x 2M latency-bound scalar
gathers); the CUDA reference does the same through the texture cache in
microseconds (warp_patch_ncc_impl.cu:18-255). TPUs have no vector gather,
so this kernel re-lays the problem for the MXU:

  - the [H, W] pixel grid is chopped into 16x16 = 256-pixel blocks;
  - per block, the taps' bounding box selects a [48, 256] window of gray_n
    (bf16, lane-aligned start) DMA'd into VMEM — warped footprints of a
    16-px block are small for the nearest-view pairs PatchMatch uses, and
    any tap outside its block's window is reported in the `ok` plane
    (callers mask it invalid, like an out-of-image tap);
  - each tap's bilinear sample is two hat-weight contractions:
      tmp[r, p] = sum_c region[r, c] * hat(c - u[p])        (MXU)
      val[p]    = sum_r hat(r - v[p]) * tmp[r, p]           (VPU reduce)
    with the derivative hats giving d(val)/du, d(val)/dv in the same pass —
    the kernel returns (val, gx, gy) so autodiff continues in XLA through
    the homography (custom_vjp: d u = d val * gx, d v = d val * gy; the
    image itself is not differentiated).

Sampling runs in bf16 (the region operand and hat weights); NCC is a
correlation of ~0..1 luma values, where bf16's ~3 decimal digits hold the
final statistic to ~1e-2 — within the loss's own masking slack (ncc < 0.9).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 16          # pixel block side (P = BLK*BLK = 256 lanes)
P = BLK * BLK
RV = 48           # region rows (window row start is aligned to the
                  # bf16 sublane tiling, so up to 15 rows may be spent on
                  # alignment)
RU = 256          # DMA region cols (>=2 lane groups so an aligned-down
                  # start always keeps >=128 usable columns)
# Effective contraction width: after a dynamic lane-rotate puts the block's
# true (unaligned) column start at lane 0, the hat weights and the MXU
# contraction only need to cover the block's actual u-footprint (~16 px block
# + patch offsets + warp distortion, typically < 30 px). 64 quarters both the
# hat-construction VPU work and the matmul K versus the aligned 256-wide
# window; taps beyond it are reported not-ok exactly like taps beyond the DMA
# window. Knob for A/B: GSJAX_NCC_RU in {64, 128, 256}.
import os as _os

RU_E = int(_os.environ.get("GSJAX_NCC_RU", "64") or 64)

_f32 = jnp.float32


def _kernel(uv_ref, img_hbm, out_ref, region, sem, *, n_taps: int,
            h_img: int, w_img: int):
    b = pl.program_id(0)
    del b
    un = uv_ref[0, :n_taps, :]                     # [K, P] (static slices)
    vn = uv_ref[0, n_taps:, :]

    # --- block bounding window (lane-aligned column start) -------------------
    vmin_raw = jnp.clip(jnp.floor(jnp.min(vn)).astype(jnp.int32) - 1,
                        0, h_img - RV)
    vmin = (vmin_raw // 16) * 16       # sublane-tiling-aligned row start
    umin_raw = jnp.clip(jnp.floor(jnp.min(un)).astype(jnp.int32) - 1,
                        0, w_img - RU)
    umin = (umin_raw // 128) * 128
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(vmin, RV), pl.ds(umin, RU)], region, sem)
    cp.start()

    cp.wait()
    # dynamic lane-rotate so the TRUE window start umin_raw sits at lane 0:
    # the contraction below then only spans RU_E columns instead of the
    # alignment-padded 256 (module constant comment). pltpu.roll shifts
    # toward higher lanes, so rotate by RU - (umin_raw - umin), mod RU.
    # Mosaic's dynamic rotate is 32-bit only: rotate in f32, cast back.
    shift = jnp.remainder(umin - umin_raw, RU)
    reg = pltpu.roll(region[...].astype(_f32), shift, 1)[:, :RU_E] \
        .astype(jnp.bfloat16)                                # [RV, RU_E]

    iota_u = jax.lax.broadcasted_iota(jnp.int32, (RU_E, P), 0).astype(_f32)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (RV, P), 0).astype(_f32)
    uminf = umin_raw.astype(_f32)
    vminf = vmin.astype(_f32)
    if RU_E == RU:
        # The rotate wraps columns [umin, umin_raw) into lanes
        # [RU - d, RU) (d = umin_raw - umin); with RU_E == RU those wrapped
        # lanes sit INSIDE reg[:, :RU_E], so the valid range must stop before
        # them: shift = (RU - d) mod RU lanes are true window columns
        # (shift == 0 <=> d == 0 <=> all RU columns valid). For RU_E <= 128
        # the wrapped lanes start at >= RU - 127 > 128 >= RU_E and are
        # sliced away, so the static cap below is exact. (ADVICE r4)
        valid_cols = jnp.where(shift > 0, shift, RU).astype(_f32)
        u_hi = jnp.minimum(valid_cols, float(min(RU_E, w_img))) - 1.001
    else:
        u_hi = min(RU_E, w_img) - 1.001

    # STATIC tap loop (n_taps is a trace-time constant): a fori_loop made
    # every uv row read and every output row write a dynamic-sublane slice —
    # 49 x 5 dynamic ops per block dominated the kernel (measured 2026-08-20:
    # unrolling 113 -> a fraction; see AB_r04.json). Unrolled, all slices are
    # static and Mosaic can software-pipeline MXU and VPU across taps.
    ok = jnp.ones((1, P), _f32)
    for k in range(n_taps):
        ur = un[k:k + 1, :] - uminf                # [1, P]
        vr = vn[k:k + 1, :] - vminf
        ok = ok * (((ur >= 0.0) & (ur <= u_hi) &
                    (vr >= 0.0) & (vr <= RV - 1.001)).astype(_f32))
        u = jnp.clip(ur, 0.0, u_hi)
        v = jnp.clip(vr, 0.0, RV - 1.001)
        du = iota_u - u                            # x = c - u, [RU_E, P]
        wu = jnp.maximum(0.0, 1.0 - jnp.abs(du))   # bilinear hat(x)
        # d(sample)/du = sum_c -hat'(c - u) * reg[c]: the weight is -hat'(x)
        # = -1 on the left cell (x in (-1, 0]), +1 on the right (x in (0, 1))
        wud = jnp.where((du > -1.0) & (du <= 0.0), -1.0,
                        jnp.where((du > 0.0) & (du < 1.0), 1.0, 0.0))
        tmp = jax.lax.dot_general(
            reg, wu.astype(jnp.bfloat16), ((((1,), (0,))), ((), ())),
            preferred_element_type=_f32)           # [RV, P]
        tmpd = jax.lax.dot_general(
            reg, wud.astype(jnp.bfloat16), ((((1,), (0,))), ((), ())),
            preferred_element_type=_f32)
        dv = iota_v - v
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(dv))
        wvd = jnp.where((dv > -1.0) & (dv <= 0.0), -1.0,
                        jnp.where((dv > 0.0) & (dv < 1.0), 1.0, 0.0))
        out_ref[0, k, :] = jnp.sum(wv * tmp, axis=0)
        out_ref[0, n_taps + k, :] = jnp.sum(wv * tmpd, axis=0)
        out_ref[0, 2 * n_taps + k, :] = jnp.sum(wvd * tmp, axis=0)
    out_ref[0, 3 * n_taps, :] = ok[0]


def _sample_call(img_bf16, uv, n_blocks: int, n_taps: int,
                 h_img: int, w_img: int, interpret: bool):
    kernel = partial(_kernel, n_taps=n_taps, h_img=h_img, w_img=w_img)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 2 * n_taps, P), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3 * n_taps + 1, P), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 3 * n_taps + 1, P), _f32),
        scratch_shapes=[pltpu.VMEM((RV, RU), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uv, img_bf16)


def _blocks_from_image(x, hb, wb):
    """[K, H, W] -> [hb*wb, K, P] pixel blocks (pad to BLK multiples).

    Edge-replicated padding: boundary blocks mix real and pad pixels, and a
    zero pad position would blow up the block's sampling bounding box."""
    k, h, w = x.shape
    x = jnp.pad(x, ((0, 0), (0, hb * BLK - h), (0, wb * BLK - w)),
                mode="edge")
    x = x.reshape(k, hb, BLK, wb, BLK)
    return jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(hb * wb, k, P)


def _image_from_blocks(x, hb, wb, h, w):
    """[hb*wb, K, P] -> [K, H, W]."""
    k = x.shape[1]
    x = x.reshape(hb, wb, k, BLK, BLK)
    x = jnp.transpose(x, (2, 0, 3, 1, 4)).reshape(k, hb * BLK, wb * BLK)
    return x[:, :h, :w]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def warp_sample(img: jax.Array, un: jax.Array, vn: jax.Array,
                interpret: bool = False):
    """Bilinear-sample `img` [H,W] at positions (un, vn) [K,H,W].

    Returns (val [K,H,W], ok [H,W] in-window flag). Positions outside the
    per-block sampling window (or the image) must be masked by the caller
    using `ok`. Differentiable wrt un/vn (image gradients are computed
    in-kernel); `img` gets a zero cotangent (NCC never differentiates the
    images)."""
    val, _, _, ok = _warp_sample_all(img, un, vn, interpret)
    return val, ok


def _warp_sample_all(img, un, vn, interpret):
    k, h, w = un.shape
    hb = -(-h // BLK)
    wb = -(-w // BLK)
    # pad image to the DMA window bounds (zeros; out-of-image taps are
    # masked by the caller's image-bounds test)
    h_pad = max(-(-h // 16) * 16, hb * BLK + RV)
    w_pad = max(-(-w // 128) * 128, wb * BLK + RU)
    img_p = jnp.pad(img, ((0, h_pad - h), (0, w_pad - w))).astype(jnp.bfloat16)
    uv = _blocks_from_image(jnp.concatenate([un, vn], axis=0), hb, wb)
    out = _sample_call(img_p, uv, hb * wb, k, h_pad, w_pad, interpret)
    planes = _image_from_blocks(out, hb, wb, h, w)
    val = planes[:k]
    gx = planes[k:2 * k]
    gy = planes[2 * k:3 * k]
    ok = planes[3 * k] >= 0.5
    return val, gx, gy, ok


def _ws_fwd(img, un, vn, interpret):
    val, gx, gy, ok = _warp_sample_all(img, un, vn, interpret)
    return (val, ok), (gx, gy)


def _ws_bwd(interpret, res, cots):
    gx, gy = res
    d_val, _ = cots
    return (None, d_val * gx, d_val * gy)


warp_sample.defvjp(_ws_fwd, _ws_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def warp_sample_blocks(img: jax.Array, un: jax.Array, vn: jax.Array,
                       interpret: bool = False):
    """Pre-blocked variant of `warp_sample` for COMPACTED block lists.

    un/vn: [B, K, P] tap positions of B (selected) 16x16-pixel blocks —
    the caller owns block selection/ordering (NCC block compaction: only
    blocks containing loss-masked pixels are passed, so kernel cost scales
    with occupancy instead of the frame). Same per-block math as
    warp_sample, so a block's (val, ok) is bit-identical to the dense
    call's for the same pixel content. Returns (val [B,K,P], ok [B,P])."""
    val, _, _, ok = _warp_sample_blocks_all(img, un, vn, interpret)
    return val, ok


def _warp_sample_blocks_all(img, un, vn, interpret):
    b, k, _p = un.shape
    h, w = img.shape
    # pad image for the DMA window bounds, like _warp_sample_all: window
    # starts are clipped to [0, dim - window], so dims must cover RV/RU
    h_pad = max(-(-h // 16) * 16, RV)
    w_pad = max(-(-w // 128) * 128, RU)
    img_p = jnp.pad(img, ((0, h_pad - h), (0, w_pad - w))).astype(jnp.bfloat16)
    uv = jnp.concatenate([un, vn], axis=1)               # [B, 2K, P]
    out = _sample_call(img_p, uv, b, k, h_pad, w_pad, interpret)
    return out[:, :k], out[:, k:2 * k], out[:, 2 * k:3 * k], \
        out[:, 3 * k] >= 0.5


def _wsb_fwd(img, un, vn, interpret):
    val, gx, gy, ok = _warp_sample_blocks_all(img, un, vn, interpret)
    return (val, ok), (gx, gy)


def _wsb_bwd(interpret, res, cots):
    gx, gy = res
    d_val, _ = cots
    return (None, d_val * gx, d_val * gy)


warp_sample_blocks.defvjp(_wsb_fwd, _wsb_bwd)
