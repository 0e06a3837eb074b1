"""Pallas TPU point-query kernels: per-point median-depth sampling and
transmittance integration over tile-binned point rounds.

Hand-written replacements for the XLA round-batch path in `gsjax.ops.sample`,
mirroring `sampleDepthCUDA` / `evaluateTransmittanceCUDA`
(sample_forward.cu:430-700, :55-169) and the hand-written depth-sample
backward (sample_backward.cu:78-359). Work layout follows the reference's
point binning (rasterizer_impl.cu:1161-1236): query points are pre-sorted by
tile and chopped into P-point *rounds*; the grid runs one round per step,
DMA-ing the owning tile's depth-sorted gaussian list (double-buffered, as in
render_pallas) plus the round's [4, P] point window.

Round-4 layout: rounds read/write points in tile-sorted, per-tile 128-aligned
order through dynamic HBM windows over SINGLE [rows, Q_al] arrays, instead of
the round-3 round-major [R, 8, P] blocks. SAMPLE_PROFILE.json showed the
kernels were only 70 ms of the 604 ms fwd+bwd at 2.07M points — the rest was
XLA glue (aligned-slot spreads, three extra 2M-row gathers, the round-major
back-permutation, and their scatter VJPs). The XLA side now builds the
aligned layout with one gather + one collision-free scatter and reads it back
with one gather + one scatter (ops/sample._rounds_pallas). Tile slices stay
128-aligned because Mosaic requires provable lane-dim divisibility for
dynamic HBM slices. A round whose window overhangs its tile's aligned slice
(windows are p_round wide, slices aren't multiples of it) computes garbage
for the foreign lanes; correctness holds because (a) rounds run ascending and
each window write waits immediately, so a slot's OWNING round (always the
latest to cover it) writes last, and (b) the backward masks foreign lanes via
the per-round valid count `pc`, so they contribute no gradients.

Forward (depth mode) = the render blend march minus color/normal accumulation
(only T, n_contrib, and the T>0.5 crossing are tracked), then the same
median-depth search as the render kernel (`_median_search`, shared).

Backward (depth mode) = the implicit-function derivative of T(t*)=0.5 at the
root (render_backward.cu:835-880 analogue, no blend terms): d_denom = dT/dt
over applied gaussians, s = -g_m / d_denom, then per-gaussian feature grads
and — unlike the render kernel — per-*point* (px, py) grads (sample points
are themselves differentiable, sample_backward.cu:200-270). Per-gaussian
grads accumulate in a VMEM tile accumulator across the consecutive rounds of
one tile and flush once per tile; the [16, K_pad] gradient output is
zero-initialised via input/output aliasing so tiles with no query points
contribute nothing.

Integrate mode is forward-only (the reference's evaluateTransmittance has no
backward) and accumulates the half-gaussian-CDF transmittance at each point's
own ray depth during the march.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.render_pallas import (
    _F, _MEDIAN_SLOTS, G, _f32, _Chunk, _col_sum, _dot, _eye16,
    _median_model, _median_search, _prefix_prod_excl, _rel_ids, _start_copy)

P_ROWS = 4   # point payload rows: px, py, eval_t, pad
O_ROWS = 8   # output rows: value, flag, n_contrib, md_init, t_final, d_denom


def _win_copy(hbm, start, buf, sem, p_round):
    """Async copy of a [rows, p_round] HBM window into VMEM. Starts are
    128-aligned (tile slices are aligned in the point layout — Mosaic
    requires provable lane-dim divisibility for dynamic HBM slices)."""
    return pltpu.make_async_copy(
        hbm.at[:, pl.ds(pl.multiple_of(start, 128), p_round)], buf, sem)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _sfwd_kernel(gs_ref, gc_ref, ps_ref, pc_ref, feats_hbm, pts_hbm, out_hbm,
                 list_buf, lsem, pt_buf, psem, flags, cache, out_buf, osem, *,
                 cfg: RasterConfig, n_rounds: int, p_round: int,
                 integrate: bool):
    r = pl.program_id(0)
    mpt = cfg.max_per_tile
    live = pc_ref[r] > 0

    @pl.when((r == 0) & live)
    def _():
        _start_copy(feats_hbm, gs_ref, list_buf, lsem, 0, 0, mpt).start()
        _win_copy(pts_hbm, ps_ref[0], pt_buf.at[0], psem.at[0],
                  p_round).start()

    # live rounds are a contiguous prefix (dead rounds carry pc == 0), so
    # prefetch/wait gating never desynchronises the double buffer
    @pl.when((r + 1 < n_rounds) & (pc_ref[jnp.minimum(r + 1, n_rounds - 1)] > 0))
    def _():
        _start_copy(feats_hbm, gs_ref, list_buf, lsem, r + 1,
                    (r + 1) % 2, mpt).start()
        _win_copy(pts_hbm, ps_ref[r + 1], pt_buf.at[(r + 1) % 2],
                  psem.at[(r + 1) % 2], p_round).start()

    @pl.when(live)
    def _body():
        _start_copy(feats_hbm, gs_ref, list_buf, lsem, r, r % 2, mpt).wait()
        _win_copy(pts_hbm, ps_ref[r], pt_buf.at[r % 2], psem.at[r % 2],
                  p_round).wait()
        buf = list_buf.at[r % 2]
        pts = pt_buf[r % 2]                      # [4, P]
        px = pts[0:1, :]
        py = pts[1:2, :]
        et = pts[2:3, :]
        count = jnp.minimum(gc_ref[r], mpt)  # see render_pallas count clamp

        eye = _eye16()
        n_chunks = (count + G - 1) // G

        tmin = _f32(cfg.transmittance_min)

        n_slots = cache.shape[0]

        def body(carry):
            # multiplicative transmittance march (see render_pallas fwd kernel)
            c, t_row, last_idx, md_init, log_tp = carry
            ch = _Chunk(buf, c, px, py, eye)
            rel = _rel_ids(c)
            a, _, passes = ch.alpha(cfg, rel, count)
            one_m = 1.0 - a
            t_prev = t_row * _prefix_prod_excl(one_m)
            t_incl = t_prev * one_m
            keep = t_incl >= tmin
            applied = passes & keep
            if not integrate:
                # bank median-model planes for _median_search (see
                # render_pallas; plane 3 is filled by the search's
                # classification pass)
                def bank():
                    am = jnp.where(applied, a, 0.0)
                    cache[c, 0] = am
                    cache[c, 1] = jnp.broadcast_to(ch.t_val, am.shape)
                    cache[c, 2] = jnp.broadcast_to(ch.col(12), am.shape)

                if cfg.max_per_tile // G <= n_slots:
                    bank()
                else:
                    pl.when(c < n_slots)(bank)
            cond = applied & (t_prev > 0.5)
            best = jnp.max(jnp.where(cond, rel, -1), axis=0, keepdims=True)
            md_new = jnp.max(jnp.where(rel == best, ch.t_val, -jnp.inf),
                             axis=0, keepdims=True)
            md_init = jnp.where(best >= 0, md_new, md_init)
            last_idx = jnp.maximum(
                last_idx, jnp.max(jnp.where(applied, rel, -1), axis=0,
                                  keepdims=True))
            if integrate:
                # half-gaussian CDF transmittance at the point's own ray depth
                # (sample_forward.cu:120-158)
                lf, *_ = _median_model(ch, a, et)
                log_tp = log_tp + jnp.sum(jnp.where(applied, lf, 0.0), axis=0,
                                          keepdims=True)
            t_row = jnp.minimum(
                t_row, jnp.min(jnp.where(keep, t_incl, 2.0), axis=0,
                               keepdims=True))
            return (c + 1, t_row, last_idx, md_init, log_tp)

        def cond_fn(carry):
            c, t_row = carry[0], carry[1]
            return (c < n_chunks) & (jnp.max(t_row) >= tmin)

        row0 = jnp.zeros((1, p_round), _f32)
        init = (jnp.int32(0), jnp.ones((1, p_round), _f32),
                jnp.full((1, p_round), -1, jnp.int32), row0, row0)
        c_end, t_final, last_idx, md_init, log_tp = jax.lax.while_loop(
            cond_fn, body, init)
        n_contrib = last_idx + 1
        out_buf[2:3, :] = n_contrib.astype(_f32)
        out_buf[3:4, :] = md_init
        out_buf[4:5, :] = t_final
        out_buf[5:8, :] = jnp.zeros((3, p_round), _f32)

        if integrate:
            out_buf[0:1, :] = jnp.exp(log_tp)
            out_buf[1:2, :] = jnp.ones((1, p_round), _f32)
        else:
            m_t, in_range, d_denom = _median_search(
                buf, px, py, eye, n_contrib, count, t_final, md_init,
                flags, cache, cfg, cached_n=jnp.minimum(c_end, n_slots))
            out_buf[0:1, :] = m_t
            out_buf[1:2, :] = in_range.astype(_f32)
            out_buf[5:6, :] = d_denom   # implicit-fn denominator for the bwd

        # sorted-window write-back. Ascending round order + the immediate
        # wait make a slot's OWNING round (the last to cover it) land last,
        # so tile-boundary overhang lanes end up with their own tile's
        # values (module docstring).
        ocp = pltpu.make_async_copy(
            out_buf,
            out_hbm.at[:, pl.ds(pl.multiple_of(ps_ref[r], 128), p_round)],
            osem)
        ocp.start()
        ocp.wait()


def _sfwd_call(feats_t, pts_rows, gs, gc, ps, pc, cfg: RasterConfig,
               n_rounds: int, p_round: int, integrate: bool, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_rounds,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, _F, cfg.max_per_tile), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, P_ROWS, p_round), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((cfg.max_per_tile // G,), jnp.int32),
            # march-filled median-model chunk cache (slot = chunk index)
            pltpu.VMEM((min(_MEDIAN_SLOTS,
                            cfg.max_per_tile // G), 4, G, p_round), _f32),
            pltpu.VMEM((O_ROWS, p_round), _f32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = partial(_sfwd_kernel, cfg=cfg, n_rounds=n_rounds,
                     p_round=p_round, integrate=integrate)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((O_ROWS, pts_rows.shape[1]), _f32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(gs, gc, ps, pc, feats_t, pts_rows)


# ---------------------------------------------------------------------------
# backward (depth mode)
# ---------------------------------------------------------------------------

def _sbwd_kernel(gs_ref, gc_ref, ps_ref, pc_ref, feats_hbm, pts_hbm, res_hbm,
                 g_hbm, dfeats_init, dpts_init, dfeats_hbm, dpts_hbm,
                 list_buf, lsem, pt_buf, psem, res_buf, rsem, g_buf, gsem,
                 acc, dpt_buf, dptsem, fsem, *,
                 cfg: RasterConfig, n_rounds: int, p_round: int):
    """Per-round gradients over sorted point windows. Per-gaussian grads
    accumulate in `acc` [16, mpt] across the consecutive rounds of one tile
    and flush to the tile's (disjoint, G-aligned) dfeats slice once. Foreign
    (overhang) lanes are masked via pc, so only the owning round of a point
    emits its gradients."""
    r = pl.program_id(0)
    mpt = cfg.max_per_tile
    live = pc_ref[r] > 0

    def in_copies(idx, slot):
        _start_copy(feats_hbm, gs_ref, list_buf, lsem, idx, slot, mpt).start()
        start = ps_ref[idx]
        _win_copy(pts_hbm, start, pt_buf.at[slot], psem.at[slot],
                  p_round).start()
        _win_copy(res_hbm, start, res_buf.at[slot], rsem.at[slot],
                  p_round).start()
        _win_copy(g_hbm, start, g_buf.at[slot], gsem.at[slot],
                  p_round).start()

    @pl.when((r == 0) & live)
    def _():
        in_copies(0, 0)

    @pl.when((r + 1 < n_rounds) & (pc_ref[jnp.minimum(r + 1, n_rounds - 1)] > 0))
    def _():
        in_copies(r + 1, (r + 1) % 2)

    @pl.when(live)
    def _body():
        slot = r % 2
        _start_copy(feats_hbm, gs_ref, list_buf, lsem, r, slot, mpt).wait()
        start = ps_ref[r]
        _win_copy(pts_hbm, start, pt_buf.at[slot], psem.at[slot],
                  p_round).wait()
        _win_copy(res_hbm, start, res_buf.at[slot], rsem.at[slot],
                  p_round).wait()
        _win_copy(g_hbm, start, g_buf.at[slot], gsem.at[slot],
                  p_round).wait()
        buf = list_buf.at[slot]
        pts = pt_buf[slot]
        px = pts[0:1, :]
        py = pts[1:2, :]
        count = jnp.minimum(gc_ref[r], mpt)  # see render_pallas count clamp
        eye = _eye16()

        res = res_buf[slot]                      # [8, P]
        g = g_buf[slot]                          # [1, P]
        m_t = res[0:1, :]
        in_range = res[1:2, :]
        n_contrib = res[2:3, :].astype(jnp.int32)
        # foreign-lane mask: every gradient term is proportional to gm
        lane_ok = jax.lax.broadcasted_iota(
            jnp.int32, (1, p_round), 1) < pc_ref[r]
        gm = jnp.where(lane_ok, g[0:1, :] * in_range, 0.0)   # dL/dm_t

        max_contrib = jnp.max(jnp.where(lane_ok, n_contrib, 0))
        nc_chunks = (max_contrib + G - 1) // G

        # fresh tile -> reset the accumulator (consecutive rounds share tiles)
        same_prev = jnp.logical_and(
            r > 0, gs_ref[jnp.maximum(r - 1, 0)] == gs_ref[r])

        @pl.when(jnp.logical_not(same_prev))
        def _():
            acc[:, :] = jnp.zeros((_F, mpt), _f32)

        # --- implicit-function denominator dlogT/dt at t = m_t, saved by the
        # forward's final root evaluation (row 5) — no re-traversal needed
        d_denom = res[5:6, :]
        s_pix = jnp.where(jnp.abs(d_denom) > 1e-20, -gm / d_denom, 0.0) \
            * in_range

        # --- per-gaussian + per-point gradients ------------------------------
        def gbody(c, dp_carry):
            dpx_acc, dpy_acc = dp_carry
            ch = _Chunk(buf, c, px, py, eye)
            rel = _rel_ids(c)
            a, a_raw, passes = ch.alpha(cfg, rel, count)
            m_applied = passes & (rel < n_contrib)
            am = jnp.where(m_applied, a, 0.0)

            def md_full(_):
                _, hg, om, behind, delta, rsig = _median_model(ch, am, m_t)
                sgn = jnp.where(behind, 1.0, -1.0)
                half_r = 0.5 / om
                dlf_da = jnp.where(behind, -1.0 / (1.0 - am) + half_r * hg,
                                   -half_r * hg)
                dlf_dg = sgn * half_r * am
                d_ax = jnp.where(m_applied, s_pix * dlf_da, 0.0)
                d_tpx = jnp.where(m_applied,
                                  s_pix * dlf_dg * hg * delta * rsig, 0.0)
                d_rsigx = _col_sum(jnp.where(
                    m_applied & (rsig > 0),
                    s_pix * dlf_dg * (-hg * delta * delta /
                                      jnp.where(rsig > 0, rsig, 1.0)),
                    0.0))
                return d_ax, d_tpx, d_rsigx

            def md_far(_):
                # every applied gaussian is >= 5 sigma from the root: hg
                # vanishes, leaving the constant log1p(-a) term of gaussians
                # BEHIND the root (render_pallas._bwd_kernel's md_far
                # analogue)
                behind = m_t > ch.t_val
                d_ax = jnp.where(m_applied & behind, -s_pix / (1.0 - am), 0.0)
                return (d_ax, jnp.zeros_like(d_ax), jnp.zeros((G, 1), _f32))

            rsig_c = ch.col(12)
            near = m_applied & (rsig_c > 0) & \
                (jnp.abs(m_t - ch.t_val) * rsig_c < 5.0)
            d_a, d_tp, d_rsig = jax.lax.cond(jnp.any(near), md_full, md_far, 0)

            notclamped = a_raw < cfg.alpha_clamp
            d_pow = jnp.where(notclamped, d_a * a, 0.0)
            expp = jnp.exp(jnp.minimum(ch.power, 0.0))
            d_op = _col_sum(jnp.where(notclamped, d_a * expp, 0.0))

            dx, dy = ch.dx, ch.dy
            ca, cb, cc = ch.col(2), ch.col(3), ch.col(4)
            rp0, rp1 = ch.col(9), ch.col(10)
            gx_term = d_pow * (-(ca * dx + cb * dy)) + d_tp * rp0
            gy_term = d_pow * (-(cc * dy + cb * dx)) + d_tp * rp1
            d_ca = _col_sum(d_pow * (-0.5 * dx * dx))
            d_cc = _col_sum(d_pow * (-0.5 * dy * dy))
            d_cb = _col_sum(d_pow * (-dx * dy))
            d_gx = _col_sum(gx_term)
            d_gy = _col_sum(gy_term)
            d_rp0 = _col_sum(d_tp * dx)
            d_rp1 = _col_sum(d_tp * dy)
            d_tc = _col_sum(d_tp)
            zero_col = jnp.zeros((G, 1), _f32)
            zero3 = jnp.zeros((G, 3), _f32)
            d_all = jnp.concatenate([
                d_gx, d_gy, d_ca, d_cb, d_cc, d_op, zero3,
                d_rp0, d_rp1, d_tc, d_rsig, zero3], axis=1)      # [G, 16]

            o = pl.multiple_of(c * G, G)
            acc[:, pl.ds(o, G)] = acc[:, pl.ds(o, G)] + _dot(eye, d_all,
                                                             ((1,), (1,)))

            # query-point grads: d/dpx = -d/dgx per interaction (dx = gx - px)
            dpx_acc = dpx_acc - jnp.sum(gx_term, axis=0, keepdims=True)
            dpy_acc = dpy_acc - jnp.sum(gy_term, axis=0, keepdims=True)
            return (dpx_acc, dpy_acc)

        row0 = jnp.zeros((1, p_round), _f32)
        dpx_acc, dpy_acc = jax.lax.fori_loop(0, nc_chunks, gbody, (row0, row0))

        # Point grads. Foreign lanes wrote zeros above (gm masked); ascending
        # round order + the immediate wait make each slot's OWNING round's
        # write land last (16 KB; the march above dominates).
        dpt_buf[0] = jnp.concatenate(
            [dpx_acc, dpy_acc, jnp.zeros((2, p_round), _f32)], axis=0)
        dcp = pltpu.make_async_copy(
            dpt_buf.at[0],
            dpts_hbm.at[:, pl.ds(pl.multiple_of(start, 128), p_round)],
            dptsem.at[0])
        dcp.start()
        dcp.wait()

        # flush the tile accumulator when the next round belongs to a new
        # tile. ONE full-window DMA: slots past this tile's chunks hold zeros
        # (acc is zero-reset per tile and gbody writes only marched chunks),
        # and the window's overhang into LATER tiles' (ascending, still-
        # unflushed) slices is overwritten by their own full-window flushes —
        # the wait is immediate, so flushes land in tile order. Replaces up
        # to mpt/G serialized 8 KB chunk DMAs per tile.
        is_last = r + 1 >= n_rounds
        nxt = jnp.minimum(r + 1, n_rounds - 1)
        # dead rounds carry gs=0 — if the ONLY live tile also starts at 0 the
        # gs comparison alone would miss the flush; their gc=0 disambiguates
        tile_done = is_last | (gs_ref[nxt] != gs_ref[r]) | (gc_ref[nxt] == 0)
        tile_chunks = (count + G - 1) // G

        @pl.when(tile_done & (tile_chunks > 0))
        def _():
            gstart = pl.multiple_of(gs_ref[r], G)
            cpc = pltpu.make_async_copy(
                acc, dfeats_hbm.at[:, pl.ds(gstart, mpt)], fsem.at[0])
            cpc.start()
            cpc.wait()


def _sbwd_call(feats_t, pts_rows, gs, gc, ps, pc, res, g_out,
               cfg: RasterConfig, n_rounds: int, p_round: int,
               interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_rounds,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # feats
            pl.BlockSpec(memory_space=pl.ANY),                    # pts
            pl.BlockSpec(memory_space=pl.ANY),                    # res
            pl.BlockSpec(memory_space=pl.ANY),                    # g
            pl.BlockSpec(memory_space=pl.ANY),                    # dfeats init
            pl.BlockSpec(memory_space=pl.ANY),                    # dpts init
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, _F, cfg.max_per_tile), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, P_ROWS, p_round), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, O_ROWS, p_round), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, p_round), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_F, cfg.max_per_tile), _f32),
            pltpu.VMEM((1, P_ROWS, p_round), _f32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    kernel = partial(_sbwd_kernel, cfg=cfg, n_rounds=n_rounds,
                     p_round=p_round)
    # dfeats/dpts are zero-initialised by aliasing zeros inputs (index counts
    # the scalar-prefetch args first: gs, gc, ps, pc, feats, pts, res, g,
    # dfeats0, dpts0) — tiles with no query points, and the sorted tail of
    # outside-frustum points no round covers, must contribute nothing.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((_F, feats_t.shape[1]), _f32),
                   jax.ShapeDtypeStruct((P_ROWS, pts_rows.shape[1]), _f32)],
        input_output_aliases={8: 0, 9: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(gs, gc, ps, pc, feats_t, pts_rows, res, g_out,
      jnp.zeros((_F, feats_t.shape[1]), _f32),
      jnp.zeros((P_ROWS, pts_rows.shape[1]), _f32))


# ---------------------------------------------------------------------------
# custom_vjp wrappers
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def sample_depth_pallas(feats_t, pts_rows, gs, gc, ps, pc,
                        cfg: RasterConfig, n_rounds: int, p_round: int,
                        interpret: bool = False):
    """Median ray-distance per query point, differentiable wrt the pair
    features and the point pixel coordinates.

    feats_t: [16, K_pad] feature-major pairs (render_pallas.pack_features_t).
    pts_rows: [4, Q_pad] point rows (px, py, eval_t, 0) in tile-sorted,
      per-tile 128-aligned order (Q_pad = Q_al + p_round overhang pad);
      gs/gc: per-round gaussian slice start/count (128-aligned starts);
      ps: per-round point window start (128-aligned); pc: number of this
      tile's aligned lanes in the window (0 for dead rounds).
    Returns [8, Q_pad] in sorted point order: rows 0 m_t (ray), 1 in_range,
    2 n_contrib, 3 md_init, 4 t_final, 5 d_denom; rows 1+ non-differentiable.
    The tail of slots no round covers (outside-frustum points) is NOT
    written — mask values with the inside flag before use."""
    return _sfwd_call(feats_t, pts_rows, gs, gc, ps, pc, cfg, n_rounds,
                      p_round, False, interpret)


def _sd_fwd(feats_t, pts_rows, gs, gc, ps, pc, cfg, n_rounds, p_round,
            interpret):
    out = _sfwd_call(feats_t, pts_rows, gs, gc, ps, pc, cfg, n_rounds,
                     p_round, False, interpret)
    return out, (feats_t, pts_rows, gs, gc, ps, pc, out)


def _sd_bwd(cfg, n_rounds, p_round, interpret, resids, g_out):
    feats_t, pts_rows, gs, gc, ps, pc, out = resids
    d_feats, d_pts = _sbwd_call(
        feats_t, pts_rows, gs, gc, ps, pc, out, g_out[0:1, :], cfg,
        n_rounds, p_round, interpret)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_feats, d_pts, zero_i(gs), zero_i(gc), zero_i(ps), zero_i(pc))


sample_depth_pallas.defvjp(_sd_fwd, _sd_bwd)


def integrate_pallas(feats_t, pts_rows, gs, gc, ps, pc, cfg: RasterConfig,
                     n_rounds: int, p_round: int, interpret: bool = False):
    """Per-point transmittance at the point's own ray depth (forward-only,
    like the reference's evaluateTransmittance). Returns [8, Q_pad] in
    sorted point order: rows 0 T(point), 1 covered flag."""
    return _sfwd_call(feats_t, pts_rows, gs, gc, ps, pc, cfg, n_rounds,
                      p_round, True, interpret)
