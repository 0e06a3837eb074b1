"""Tile binning: duplicate gaussians into (tile, depth)-sorted pair lists.

TPU-native replacement for `duplicateWithKeys` + cub radix sort +
`identifyTileRanges` (rasterizer_impl.cu:70-161, 380-422). Key differences:

  - Static shapes: a fixed `pair_capacity` buffer (bucketed, recompile on
    growth) instead of the reference's `num_rendered`-sized dynamic alloc.
  - Expansion without scatter: pair p finds its source gaussian with
    `searchsorted` over the inclusive cumsum of tiles_touched (O(K log N)
    vectorised), rather than per-gaussian dynamic writes.
  - `jax.lax.sort` with two keys (tile, depth) instead of a packed 64-bit
    radix key (rasterizer_impl.cu:98-100).

All quantities here are non-differentiable (sort order is fixed wrt autodiff,
matching the reference backward which treats the binning as constant).
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp

# fused (tile << bits | depth-msbs) u32 sort key vs lexicographic
# (tile, depth) two-key sort — see the comment at the sort site
_FUSED_SORT_KEY = os.environ.get("GSJAX_FUSED_SORT_KEY", "1") not in ("0", "")
# aligned re-layout of gauss ids via scatter-from-sorted vs monotone gather
_SCATTER_LAYOUT = os.environ.get("GSJAX_SCATTER_LAYOUT", "1") not in ("0", "")
# exact ellipse-tile cull of provably-dead rect pairs (A/B knob)
_ELLIPSE_CULL = os.environ.get("GSJAX_ELLIPSE_CULL", "1") not in ("0", "")

from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import Preprocessed


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Binning:
    gauss_idx: jax.Array    # [K_al] int32 gaussian index per pair slot (pad -> 0)
    pair_valid: jax.Array   # [K_al] bool
    tile_start: jax.Array   # [T] int32 aligned offset of each tile's slice
    tile_count: jax.Array   # [T] int32 number of real pairs in each tile
    num_pairs: jax.Array    # [] int32 total enumerated pairs (expansion
    #                             buffer watermark, includes culled)
    num_live: jax.Array     # [] int32 post-cull pairs (aligned-layout
    #                             watermark, live_capacity monitoring)
    max_tile_count: jax.Array  # [] int32 (for max_per_tile monitoring)


def bin_gaussians(prep: Preprocessed, cfg: RasterConfig, width: int, height: int,
                  row_lo=None, row_hi=None,
                  pair_capacity: int | None = None,
                  row_lo2=None, row_hi2=None,
                  continuous_coords: bool = False) -> Binning:
    """Bin gaussians into depth-sorted per-tile pair lists.

    row_lo/row_hi (+ a smaller pair_capacity) restrict binning to the
    tile-ROW band [row_lo, row_hi): each gaussian's tile rect is clipped
    vertically before expansion, so only the band's pairs are enumerated,
    sorted and re-laid. This is the per-device path under shard_map — each
    chip bins only its own band, making the binning cost scale down with the
    mesh instead of being replicated (SURVEY section 2.3). Tiles outside the
    band report count=0.

    row_lo2/row_hi2 add a SECOND disjoint row interval (must start at or
    after row_hi): the mirrored dual-band partition pairs a pair-dense band
    with a sparse one per device, cutting the row-quantisation load
    imbalance of single contiguous bands (parallel/shard.py).

    continuous_coords: the render kernels evaluate pairs only at integer
    pixel centres, so the exact ellipse cull's box-min runs over
    [tile*t, tile*t + tile - 1]. The point-query path (ops/sample.py)
    evaluates at CONTINUOUS coordinates that can lie in the sub-pixel strip
    (tile - 1, tile) of a tile — pass True there to extend the cull box to
    the full tile extent so such pairs are never wrongly culled."""
    tiles_x, tiles_y = cfg.grid(width, height)
    num_tiles = tiles_x * tiles_y
    k = pair_capacity if pair_capacity is not None else cfg.pair_capacity
    n = prep.tiles_touched.shape[0]

    # XLA on TPU fuses chains of gather/scatter/arithmetic into serial loop
    # fusions (~100x slower than the standalone fast paths); barriers pin each
    # stage to its own efficient kernel.
    barrier = jax.lax.optimization_barrier

    touched = jax.lax.stop_gradient(prep.tiles_touched)
    rect_y0 = prep.rect_min[:, 1]
    rect_y1 = rect_y0 + prep.rect_wh[:, 1]
    rect_w = jnp.maximum(prep.rect_wh[:, 0], 1)
    if row_lo is not None:
        # clip each rect to the band(s); culled gaussians keep touched == 0
        y0c = jnp.clip(rect_y0, row_lo, row_hi)
        y1c = jnp.clip(rect_y1, row_lo, row_hi)
        rows1 = jnp.maximum(y1c - y0c, 0)
        if row_lo2 is not None:
            y0c2 = jnp.clip(rect_y0, row_lo2, row_hi2)
            y1c2 = jnp.clip(rect_y1, row_lo2, row_hi2)
            rows2 = jnp.maximum(y1c2 - y0c2, 0)
        else:
            y0c2 = jnp.zeros_like(y0c)
            rows2 = jnp.zeros_like(rows1)
        touched = jnp.where(touched > 0, rect_w * (rows1 + rows2), 0)
        rect_y0 = y0c
    else:
        rows1 = jnp.maximum(rect_y1 - rect_y0, 0)  # full rect: jr < rows1
        y0c2 = jnp.zeros_like(rect_y0)
    cum = jnp.cumsum(touched)                      # inclusive
    total = cum[-1]

    # pair p -> source gaussian. A searchsorted over [K] queries lowers to a
    # serial gather loop on TPU (~100x slower than this): instead scatter each
    # gaussian's id at its exclusive-cumsum start and take a running max —
    # valid gaussians have strictly increasing unique starts, so the prefix
    # max reconstructs the owner of every pair slot.
    p_ids = jnp.arange(k, dtype=jnp.int32)
    starts_exc = cum - touched
    g_ids = jnp.arange(n, dtype=jnp.int32)
    mark = jnp.zeros((k,), jnp.int32).at[
        jnp.where(touched > 0, starts_exc, k)].set(g_ids, mode="drop")
    g = barrier(jax.lax.cummax(barrier(mark)))

    # one packed row-gather instead of 13 scalar gathers (TPU gathers are
    # per-row; all values fit exactly in f32). Columns 7..12 feed the exact
    # ellipse-tile cull below; cols 5/6 map dual-band virtual rows.
    sg = jax.lax.stop_gradient
    packed = barrier(jnp.stack([
        starts_exc.astype(jnp.float32),
        prep.rect_min[:, 0].astype(jnp.float32),
        rect_y0.astype(jnp.float32),
        rect_w.astype(jnp.float32),
        sg(prep.depth),
        rows1.astype(jnp.float32),
        y0c2.astype(jnp.float32),
        sg(prep.mean2d[:, 0]),
        sg(prep.mean2d[:, 1]),
        sg(prep.conic[:, 0]),
        sg(prep.conic[:, 1]),
        sg(prep.conic[:, 2]),
        sg(prep.opacity),
    ], axis=1)[g])                                 # [K,13]
    j = p_ids - packed[:, 0].astype(jnp.int32)     # rank within g's rect(s)
    w = packed[:, 3].astype(jnp.int32)
    jr = j // w
    r1 = packed[:, 5].astype(jnp.int32)
    # virtual row jr walks interval 1 then interval 2 (full rect: jr < r1)
    ty = jnp.where(jr < r1,
                   packed[:, 2].astype(jnp.int32) + jr,
                   packed[:, 6].astype(jnp.int32) + (jr - r1))
    tx = packed[:, 1].astype(jnp.int32) + j % w
    tile = ty * tiles_x + tx

    # --- exact ellipse-tile cull --------------------------------------------
    # Rect binning (getRect, the reference's scheme) enumerates every tile of
    # the gaussian's bounding rect; for large/anisotropic gaussians much of
    # the rect never reaches alpha_min. A pair is provably dead iff the MIN
    # of q(dx,dy) = 0.5*ca*dx^2 + cb*dx*dy + 0.5*cc*dy^2 over the tile's
    # pixel box exceeds ln(op/alpha_min) — then every pixel of the tile
    # fails the kernels' `passes` test (alpha < alpha_min) and the pair
    # contributes exactly zero forward AND backward. q is PSD with its only
    # critical point at the centre, so the box min is 0 if the centre is
    # inside, else the min over the 4 edges (each a clamped 1-D quadratic).
    # The 1e-3 margin keeps pairs within f32 evaluation-order noise of the
    # threshold, so kernel outputs are bit-identically unaffected.
    gx, gy = packed[:, 7], packed[:, 8]
    ca, cb, cc = packed[:, 9], packed[:, 10], packed[:, 11]
    op = packed[:, 12]
    txp = (tx * cfg.tile).astype(jnp.float32)
    typ = (ty * cfg.tile).astype(jnp.float32)
    box_hi = cfg.tile if continuous_coords else cfg.tile - 1
    ax = gx - (txp + box_hi)                       # dx = gx - px range
    bx = gx - txp
    ay = gy - (typ + box_hi)
    by = gy - typ
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def q_at(dx, dy):
        return 0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy

    def edge_x(dxf):                               # min over dy at fixed dx
        return q_at(dxf, jnp.clip(-cb * dxf / cc_s, ay, by))

    def edge_y(dyf):
        return q_at(jnp.clip(-cb * dyf / ca_s, ax, bx), dyf)

    inside = (ax <= 0) & (bx >= 0) & (ay <= 0) & (by >= 0)
    q_min = jnp.where(inside, 0.0, jnp.minimum(
        jnp.minimum(edge_x(ax), edge_x(bx)),
        jnp.minimum(edge_y(ay), edge_y(by))))
    thr = jnp.log(jnp.maximum(op, 1e-12)) - math.log(cfg.alpha_min)
    keep_pair = q_min <= thr + 1e-3

    pair_valid = p_ids < total
    if _ELLIPSE_CULL:
        pair_valid = pair_valid & keep_pair
    key_tile = jnp.where(pair_valid, tile, num_tiles).astype(jnp.int32)

    if _FUSED_SORT_KEY:
        # One u32 key = tile_id << depth_bits | depth_msbs. Positive f32s
        # compare identically to their bit patterns, so the depth's top
        # (32 - tile_bits) exponent+mantissa bits preserve front-to-back
        # order within a tile (tie order below ~2^-12 relative depth is
        # unspecified-but-deterministic, like the reference's 64-bit radix
        # key truncated to 32, rasterizer_impl.cu:98-100). Sorting (u32,
        # i32) instead of
        # (i32, f32, i32) with a 2-key lexicographic comparator roughly
        # halves the TPU bitonic sort's compare + permute traffic.
        tile_bits = max(int(num_tiles + 1).bit_length(), 1)
        depth_bits = 32 - tile_bits
        dbits = jax.lax.bitcast_convert_type(
            jnp.maximum(packed[:, 4], 0.0), jnp.uint32)
        dq = jax.lax.shift_right_logical(dbits, jnp.uint32(tile_bits))
        key = (key_tile.astype(jnp.uint32) << depth_bits) | \
            jnp.where(pair_valid, dq, jnp.uint32(0xFFFFFFFF) >> tile_bits)
        key, sorted_g = jax.lax.sort((key, g), num_keys=1)
        sorted_tile = (key >> depth_bits).astype(jnp.int32)
    else:
        key_depth = jnp.where(pair_valid, packed[:, 4], jnp.inf)
        sorted_tile, _, sorted_g = jax.lax.sort(
            (key_tile, key_depth, g), num_keys=2)

    bounds = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]

    # --- re-lay pairs so every tile slice starts on an `align` boundary ------
    # The Pallas blend/backward kernels DMA each tile's slice as a statically
    # lane-aligned window; alignment makes per-tile windows disjoint so the
    # backward can write per-pair gradients without cross-tile accumulation.
    # Per-slot source indices come from three monotone scatter-max + cummax
    # "spreads" — NO per-slot table gathers: a [K_al]<-[T] gather lowers to a
    # ~20ms serial loop fusion on TPU, the spreads are bandwidth-bound.
    # The aligned buffer is sized by live_capacity (<= pair_capacity): the
    # ellipse cull shrinks the live set ~30%, and every downstream pass
    # (prepare_pairs gather, pack, the bwd pair-grad buffer and its ~43 ms
    # scatter) scales with this capacity. While num_live <= live_k the
    # aligned total fits k_al = live_k + T*align by construction; on
    # overflow, slice starts clamp to k_al so the kernels' DMA windows stay
    # inside the (mpt-padded) buffer — overflowing tiles read the zero pad
    # (alpha 0, zero contribution, memory-safe) for the one step before the
    # num_live watermark triggers the same bump-retry as pair_capacity.
    align = cfg.align
    live_k = min(cfg.live_capacity or k, k)
    k_al = live_k + num_tiles * align
    start_al = jnp.minimum(jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(-(-tile_count // align) * align).astype(jnp.int32)[:-1]]),
        k_al)

    def spread(vals):  # vals [T] non-decreasing -> per-slot value
        return barrier(jax.lax.cummax(
            jnp.zeros((k_al,), jnp.int32).at[start_al].max(vals, mode="drop")))

    sa = spread(start_al)
    ts = spread(tile_start)
    # clamp each tile's valid span at max_per_tile: the blend kernels march at
    # most max_per_tile pairs per tile (render_pallas.py clamps `count`), so
    # overflow slots are never rendered NOR gradient-written — leaving them
    # pair_valid would scatter uninitialized backward-buffer HBM into real
    # gaussian gradients in the step(s) before monitor_capacity bumps the cap.
    be = spread(tile_start + jnp.minimum(tile_count, cfg.max_per_tile))
    q_ids = jnp.arange(k_al, dtype=jnp.int32)
    src = ts + (q_ids - sa)
    valid_al = src < be

    if _SCATTER_LAYOUT:
        # dense gauss ids in the aligned layout, via SCATTER from sorted
        # order rather than `sorted_g[src]`: that monotone gather is
        # latency-bound on the 2^21-entry table (23.3 ms measured on TPU
        # 2026-08-19 vs 12.4 ms for this [k]->[k_al] i32 scatter + ~2 ms of
        # [k]-spreads). Sorted position s lands at aligned slot
        # s + pad_before(tile_of_s); positions past a tile's max_per_tile
        # clamp (or past the live total) are dropped.
        padoff = start_al - tile_start                 # [T] non-decreasing
        keepv = tile_start + jnp.minimum(tile_count, cfg.max_per_tile)
        s_ids = jnp.arange(k, dtype=jnp.int32)

        def spread_sorted(vals):  # [T] non-decreasing -> per-sorted-slot
            return barrier(jax.lax.cummax(jnp.zeros((k,), jnp.int32).at[
                tile_start].max(vals, mode="drop")))

        keep_s = s_ids < spread_sorted(keepv)
        dst = jnp.where(keep_s, s_ids + spread_sorted(padoff), k_al)
        g_al = jnp.zeros((k_al,), jnp.int32).at[dst].set(sorted_g,
                                                         mode="drop")
    else:
        g_al = barrier(sorted_g[barrier(jnp.where(valid_al, src, 0))])

    return Binning(
        gauss_idx=jnp.where(valid_al, g_al, 0),
        pair_valid=valid_al,
        tile_start=start_al,
        tile_count=tile_count,
        num_pairs=total.astype(jnp.int32),
        num_live=bounds[-1],
        max_tile_count=jnp.max(tile_count),
    )
