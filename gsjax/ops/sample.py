"""Point-query kernels: differentiable cross-view depth sampling and
transmittance integration.

Equivalents of `sampleDepthCUDA` (sample_forward.cu:430-700) and
`evaluateTransmittanceCUDA` (sample_forward.cu:55-169).

TPU structure mirrors the reference's point binning
(`createWithKeys`/`countPointBatches`/`setBlockId`,
rasterizer_impl.cu:109-183, 1161-1236): query points are projected, sorted by
their pixel's tile, and expanded into fixed-size per-tile *rounds*. Each round
marches its tile's depth-sorted gaussian slice exactly like the render path —
dense [chunk, round] VPU math with a scalar-start dynamic slice per chunk —
instead of a per-point gather (a vmapped per-point dynamic_slice lowers to a
pathological gather program on TPU; this layout is the same one render_ref
proves out for pixels).

sample_depth returns, per point, the 3D point at the view's median depth along
the query pixel ray (in the view's camera frame) — the core of the PGSR
geometric loss (utils/loss_utils.py:160-198). Fully differentiable: gradients
flow both to the gaussians and to the query points (through the projection),
replacing the reference's hand-written sample_backward.cu.

integrate returns the half-gaussian CDF transmittance at each point's own ray
depth — the opacity-field sample used for marching-tetrahedra SDF extraction
(mesh_extract_tetrahedra.py:64-87).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.ops.raster import render_pallas, render_ref, sample_pallas
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import preprocess

_F = render_ref._F


def _project_points(points, camera: Camera, cfg: RasterConfig):
    """Project query points into the view. Returns (px, py, t_ray, inside0)."""
    hp = jax.lax.Precision.HIGHEST
    wv = camera.world_view
    pv = jnp.einsum("ni,ji->nj", points, wv[:3, :3], precision=hp) + wv[:3, 3]
    z = pv[:, 2]
    in_front = z > cfg.near_plane
    ph = jnp.einsum("ni,ji->nj", points, camera.full_proj[:3, :3], precision=hp) \
        + camera.full_proj[:3, 3]
    pw = jnp.einsum("ni,i->n", points, camera.full_proj[3, :3]) + camera.full_proj[3, 3]
    pp = ph / (pw[:, None] + 1e-7)
    px = ((pp[:, 0] + 1) * camera.width - 1) * 0.5
    py = ((pp[:, 1] + 1) * camera.height - 1) * 0.5
    inside0 = in_front & (px >= 0) & (px <= camera.width - 1) & \
        (py >= 0) & (py <= camera.height - 1)
    t_ray = jnp.linalg.norm(pv, axis=-1)
    return px, py, t_ray, inside0


def _point_tile(px, py, camera, cfg):
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    tx = jnp.clip((px // cfg.tile).astype(jnp.int32), 0, tiles_x - 1)
    ty = jnp.clip((py // cfg.tile).astype(jnp.int32), 0, tiles_y - 1)
    return ty * tiles_x + tx


class _QueryMode:
    DEPTH = "depth"          # median-depth bisection (sample_depth / evaluate_sdf)
    INTEGRATE = "integrate"  # CDF transmittance at the point's own ray depth


def _march_rounds(feats_pairs, gs, gc, pxr, pyr, cfg: RasterConfig, etr=None):
    """March a batch of rounds through their tiles' gaussian chunks.

    gs, gc: [B] scalar gaussian-slice starts/counts; pxr/pyr: [B,P] point
    coords; etr: [B,P] eval depths (integrate path) or None.
    Returns dict(t_final, n_contrib, md_init[, t_point]) each [B,P]."""
    b, p = pxr.shape
    chunk = cfg.chunk
    n_chunks = -(-cfg.max_per_tile // chunk)
    log_tmin = math.log(cfg.transmittance_min)
    bmax = jnp.max(gc)

    def chunk_one(carry, c, start, count, px, py, et):
        log_t, last_idx, md_init, log_tp = carry
        base = start + c * chunk
        feats = jax.lax.dynamic_slice(feats_pairs, (base, 0), (chunk, _F))
        rel = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        entry_valid = rel < count
        a, passes, dx, dy = render_ref._alpha_terms(feats, px, py, cfg, entry_valid)
        log1m = jnp.log1p(-a)                               # [C,P]
        l_incl = log_t[None, :] + jnp.cumsum(log1m, axis=0)
        keep = l_incl >= log_tmin
        l_prev = l_incl - log1m
        applied = passes & keep
        t_val = feats[:, 9:10] * dx + feats[:, 10:11] * dy + feats[:, 11:12]
        cond = applied & (jnp.exp(l_prev) > 0.5)
        k_ids = jnp.arange(chunk, dtype=jnp.int32)[:, None]
        best = jnp.max(jnp.where(cond, k_ids, -1), axis=0)  # [P]
        md_chunk = jnp.take_along_axis(t_val, jnp.maximum(best, 0)[None, :],
                                       axis=0)[0]
        md_init = jnp.where(best >= 0, md_chunk, md_init)
        last_idx = jnp.maximum(
            last_idx, jnp.max(jnp.where(applied, rel[:, None], -1), axis=0))
        log_t = log_t + jnp.sum(log1m * keep, axis=0)
        if et is not None:
            # half-gaussian CDF transmittance at the point's own depth
            # (sample_forward.cu:120-158)
            rsig = feats[:, 12:13]
            delta = (t_val - et[None, :]) * rsig
            g = jnp.where(rsig > 0, jnp.exp(-0.5 * delta * delta), 0.0)
            om = jnp.maximum(1.0 - a * g, 1e-12)
            lf = jnp.where(et[None, :] > t_val,
                           log1m - 0.5 * jnp.log(om), 0.5 * jnp.log(om))
            log_tp = log_tp + jnp.sum(lf * applied, axis=0)
        return (log_t, last_idx, md_init, log_tp)

    carry0 = (jnp.zeros((b, p)), jnp.full((b, p), -1, jnp.int32),
              jnp.zeros((b, p)), jnp.zeros((b, p)))

    @partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
    def step(carry, c):
        def do(cr):
            if etr is None:
                return jax.vmap(
                    lambda cr_, s, cnt, px, py: chunk_one(
                        cr_, c, s, cnt, px, py, None)
                )(cr, gs, gc, pxr, pyr)
            return jax.vmap(
                lambda cr_, s, cnt, px, py, et: chunk_one(
                    cr_, c, s, cnt, px, py, et)
            )(cr, gs, gc, pxr, pyr, etr)
        return jax.lax.cond(c * chunk < bmax, do, lambda cr: cr, carry), None

    carry, _ = jax.lax.scan(step, carry0, jnp.arange(n_chunks, dtype=jnp.int32))
    log_t, last_idx, md_init, log_tp = carry
    out = dict(t_final=jnp.exp(log_t), n_contrib=last_idx + 1, md_init=md_init)
    if etr is not None:
        out["t_point"] = jnp.exp(log_tp)
    return out


# Read once at import: the choice is baked into the jit cache (keyed only on
# cfg/shapes), so a process-level constant is the honest semantics — changing
# the env var mid-process could never take effect anyway.
import os as _os

_SAMPLE_BACKEND_ENV = _os.environ.get("GSJAX_SAMPLE_BACKEND", "")


def _use_pallas(cfg: RasterConfig) -> bool:
    """Point-query backend choice (same convention as api._use_pallas);
    GSJAX_SAMPLE_BACKEND=ref|pallas overrides for A/B runs (process-level,
    read at import)."""
    if _SAMPLE_BACKEND_ENV in ("ref", "pallas"):
        return _SAMPLE_BACKEND_ENV == "pallas"
    if cfg.backend == "ref":
        return False
    if cfg.backend == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _query(points, means3d, scales, rotations, opacities, camera, cfg,
           alive, p_round, round_batch, mode):
    """Shared core: bin points to tiles, march rounds, scatter back.

    Returns (value, flag, px, py, t_ray, inside0)."""
    q = points.shape[0]
    cfg = dataclasses.replace(cfg, sh_degree=0, sg_degree=0)  # colour unused
    shs = jnp.zeros((means3d.shape[0], 1, 3))
    prep = preprocess(means3d, scales, rotations, opacities, shs,
                      None, None, None, camera, cfg, alive)
    # continuous_coords: query points can sit in the sub-pixel strip past the
    # last pixel centre of a tile; the cull box must cover the full extent
    binning = bin_gaussians(prep, cfg, camera.width, camera.height,
                            continuous_coords=True)
    feats_pairs = render_ref.prepare_pairs(prep, binning, cfg)

    px, py, t_ray, inside0 = _project_points(points, camera, cfg)
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    num_tiles = tiles_x * tiles_y

    # ---- bin points by tile ------------------------------------------------
    tile = _point_tile(px, py, camera, cfg)
    key = jnp.where(inside0, tile, num_tiles).astype(jnp.int32)
    sorted_key, sorted_q = jax.lax.sort(
        (jax.lax.stop_gradient(key), jnp.arange(q, dtype=jnp.int32)),
        num_keys=1)
    bounds = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    pt_start, pt_end = bounds[:-1], bounds[1:]

    if _use_pallas(cfg):
        val, flag = _rounds_pallas(
            feats_pairs, binning, sorted_q, pt_start, pt_end, px, py, t_ray,
            q, num_tiles, cfg, p_round, mode)
    else:
        val, flag = _rounds_xla(
            feats_pairs, binning, sorted_q, pt_start, pt_end, px, py, t_ray,
            q, num_tiles, cfg, p_round, round_batch, mode)
    return val, flag.astype(bool), px, py, t_ray, inside0


def _rounds_pallas(feats_pairs, binning, sorted_q, pt_start, pt_end,
                   px, py, t_ray, q, num_tiles, cfg, p_round, mode):
    """Hand-written Pallas point-query path: tile-sorted 128-aligned point
    layout with per-round HBM windows over single [rows, Q_al] arrays
    (sample_pallas.py).

    The round-3 version emitted round-major [R, 8, P] output blocks;
    SAMPLE_PROFILE.json showed the glue around them (the [R*P] flattening,
    its flat-index spread + extra gather, the tgt scatter, and all their
    VJPs) cost several times the kernels themselves. The kernel now
    reads/writes aligned sorted windows of single arrays directly (foreign
    overhang lanes masked via the per-round valid count `pc`), so the XLA
    side is the aligned-slot gathers in and ONE scatter out."""
    barrier = jax.lax.optimization_barrier
    interpret = jax.default_backend() != "tpu"
    a = 128
    p_round = max(a, -(-p_round // a) * a)             # lane-aligned width
    pt_count = pt_end - pt_start

    # Mosaic requires dynamic HBM window starts on the lane dimension to be
    # provably 128-divisible, so tile slices stay `a`-aligned: aligned slot
    # i of tile t reads sorted slot pt_start[t] + (i - astart[t]). The
    # gather construction below measured ~35 ms at 2M points; the seemingly
    # leaner scatter construction (dst = s + pad_off spread, one [Q,2] row
    # scatter) measured ~100 ms — XLA's 2-col f32 row scatter is ~3x the
    # price of these gathers. Keep the gathers.
    astart = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(-(-pt_count // a) * a).astype(jnp.int32)[:-1]])
    q_al = -(-q // a) * a + num_tiles * a              # static capacity

    def spread_al(vals):
        return barrier(jax.lax.cummax(
            jnp.zeros((q_al,), jnp.int32).at[astart].max(vals, mode="drop")))

    ids = jnp.arange(q_al, dtype=jnp.int32)
    sa = spread_al(astart)
    src = spread_al(pt_start) + (ids - sa)
    valid_al = src < spread_al(pt_end)
    src_safe = jnp.where(valid_al, src, 0)

    integrate = mode == _QueryMode.INTEGRATE
    cols = [px, py] + ([t_ray] if integrate else [])
    # layout gathers: aligned slot -> original point index (one 1-d int
    # gather), then one 1-d f32 gather PER COORDINATE ROW. Strictly 1-d:
    # the profiler showed [Q,2] row-form gathers/scatters lower to narrow
    # T(2,128)-tiled kernels (the final 2-col scatter alone was 92 ms of the
    # 542 ms step; 1-d scatters of the same data are ~12 ms each). Aligned
    # padding slots keep zeros (and zero cotangents), so the kernel's
    # garbage math on them is masked for free.
    tgt_raw = barrier(sorted_q[src_safe])              # [q_al]
    tgt_safe = jnp.where(valid_al, tgt_raw, 0)
    rows = [jnp.where(valid_al, barrier(c[tgt_safe]), 0.0) for c in cols]
    rows += [jnp.zeros((q_al,))] * (4 - len(rows))
    pts_rows = jnp.pad(jnp.stack(rows, axis=0), ((0, 0), (0, p_round)))

    # rounds: `p_round` consecutive aligned slots of one tile per grid step
    acount = -(-pt_count // a) * a                     # aligned span per tile
    rpt = -(-acount // p_round)
    r_exc = jnp.cumsum(rpt) - rpt
    r_total = r_exc[-1] + rpt[-1]
    r_cap = q_al // p_round + num_tiles + 1            # static grid size

    def spread_r(vals):
        return barrier(jax.lax.cummax(
            jnp.zeros((r_cap,), jnp.int32).at[
                jnp.where(rpt > 0, r_exc, r_cap)].max(vals, mode="drop")))

    r_ids = jnp.arange(r_cap, dtype=jnp.int32)
    j = r_ids - spread_r(r_exc)
    live = r_ids < r_total
    round_ps = jnp.where(live, spread_r(astart) + j * p_round, 0)
    round_pc = jnp.where(
        live, jnp.clip(spread_r(astart + acount) - round_ps, 0, p_round), 0)
    round_gs = jnp.where(live, spread_r(binning.tile_start), 0)
    round_ge = spread_r(binning.tile_start + binning.tile_count)
    round_gc = jnp.where(live, round_ge - round_gs, 0)

    feats_t = render_pallas.pack_features_t(feats_pairs, cfg)
    if integrate:
        out = sample_pallas.integrate_pallas(
            feats_t, pts_rows, round_gs, round_gc, round_ps, round_pc, cfg,
            r_cap, p_round, interpret)
    else:
        out = sample_pallas.sample_depth_pallas(
            feats_t, pts_rows, round_gs, round_gc, round_ps, round_pc, cfg,
            r_cap, p_round, interpret)
    # Back out: two 1-d scatters (XLA fuses them), aligned slots -> original
    # point order. A single +1-encoded payload scatter was measured equal
    # (AB_r04.json) — the second scatter is free, so keep exact semantics.
    # Invalid aligned slots (padding; the tail of outside-frustum points
    # maps to no aligned slot at all) are dropped/zeroed, so callers AND
    # gradients see exact zeros for uncovered points (NaN garbage would
    # leak through `where` VJPs).
    tgt_al = jnp.where(valid_al, tgt_raw, q)
    val_al = jnp.where(valid_al, out[0, :q_al], 0.0)
    flag_al = jnp.where(valid_al, out[1, :q_al], 0.0)
    val = barrier(jnp.zeros((q,)).at[tgt_al].set(val_al, mode="drop"))
    flag = barrier(jnp.zeros((q,)).at[tgt_al].set(
        jax.lax.stop_gradient(flag_al), mode="drop"))
    # flag cotangents land on out row 1, which the kernel vjp ignores
    # (rows 1+ are non-differentiable residuals)
    return val, jax.lax.stop_gradient(flag)


def _rounds_xla(feats_pairs, binning, sorted_q, pt_start, pt_end,
                px, py, t_ray, q, num_tiles, cfg, p_round, round_batch, mode):
    """Pure-XLA point-query path (CPU fallback / parity reference)."""
    barrier = jax.lax.optimization_barrier
    pt_count = pt_end - pt_start
    rpt = -(-pt_count // p_round)
    r_exc = jnp.cumsum(rpt) - rpt
    r_total = r_exc[-1] + rpt[-1]
    r_cap = q // p_round + num_tiles + 1
    nb = -(-r_cap // round_batch)
    r_pad = nb * round_batch

    def spread(vals):
        # per-tile non-decreasing values -> per-round owner value, without an
        # [R]<-[T] gather (binning.py's scatter-max + cummax pattern)
        return barrier(jax.lax.cummax(
            jnp.zeros((r_pad,), jnp.int32).at[
                jnp.where(rpt > 0, r_exc, r_pad)].max(vals, mode="drop")))

    r_ids = jnp.arange(r_pad, dtype=jnp.int32)
    j = r_ids - spread(r_exc)
    round_ps = spread(pt_start) + j * p_round
    round_pe = spread(pt_end)
    round_gs = spread(binning.tile_start)
    # aligned slice ends are monotone too (start[t]+count[t] <= start[t+1])
    round_ge = spread(binning.tile_start + binning.tile_count)
    round_gc = jnp.where(r_ids < r_total, round_ge - round_gs, 0)

    # sorted point coords (+ eval depth), padded so round slices never clamp
    cols = [px, py] + ([t_ray] if mode == _QueryMode.INTEGRATE else [])
    packed = barrier(jnp.stack(cols, axis=1)[sorted_q])           # [Q, 2|3]
    packed = jnp.concatenate(
        [packed, jnp.zeros((p_round, packed.shape[1]))], axis=0)

    # heavy rounds first so each batch is roughly homogeneous in chunk count
    order = jnp.argsort(-round_gc)
    inv_order = jnp.argsort(order)
    ps_s, pe_s = round_ps[order], round_pe[order]
    gs_s, gc_s = round_gs[order], round_gc[order]

    def batch_body(_, bidx):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(
            x, bidx * round_batch, round_batch)
        ps_b, pe_b = sl(ps_s), sl(pe_s)
        rows = jax.vmap(lambda s: jax.lax.dynamic_slice(
            packed, (s, 0), (p_round, packed.shape[1])))(ps_b)    # [B,P,2|3]
        pxr, pyr = rows[..., 0], rows[..., 1]
        etr = rows[..., 2] if mode == _QueryMode.INTEGRATE else None
        m = _march_rounds(feats_pairs, sl(gs_s), sl(gc_s), pxr, pyr, cfg, etr)
        if mode == _QueryMode.DEPTH:
            md, in_r = render_ref.bisect_batch(
                feats_pairs, sl(gs_s), m["n_contrib"], m["md_init"],
                m["t_final"], pxr, pyr, cfg)
            return None, (md, in_r.astype(jnp.int32))
        return None, (m["t_point"], jnp.ones_like(m["t_point"], jnp.int32))

    _, (val_b, flag_b) = jax.lax.scan(batch_body, None,
                                      jnp.arange(nb, dtype=jnp.int32))
    val_r = val_b.reshape(r_pad, p_round)[inv_order]              # round-major
    flag_r = flag_b.reshape(r_pad, p_round)[inv_order]

    # scatter back: round slot -> sorted position -> original point index.
    # Indices are unique where valid (rounds tile the sorted range disjointly).
    slot_idx = round_ps[:, None] + jnp.arange(p_round, dtype=jnp.int32)[None, :]
    slot_valid = (slot_idx < round_pe[:, None]) & (r_ids < r_total)[:, None]
    tgt = jnp.where(slot_valid, slot_idx, q)
    val_sorted = barrier(jnp.zeros((q,)).at[tgt.reshape(-1)].set(
        val_r.reshape(-1), mode="drop"))
    flag_sorted = barrier(jnp.zeros((q,), jnp.int32).at[tgt.reshape(-1)].set(
        flag_r.reshape(-1), mode="drop"))
    val = barrier(jnp.zeros((q,)).at[sorted_q].set(val_sorted))
    flag = barrier(jnp.zeros((q,), jnp.int32).at[sorted_q].set(flag_sorted))
    return val, flag


@partial(jax.jit, static_argnames=("cfg", "point_batch", "round_batch"))
def sample_depth(points: jax.Array,
                 means3d, scales, rotations, opacities,
                 camera: Camera, cfg: RasterConfig,
                 alive=None, point_batch: int = 1024, round_batch: int = 64):
    """Differentiable cross-view median-depth sampling.

    Args:
      points: [Q,3] world-space query points (grads flow into them).
      means3d/scales/rotations/opacities: gaussian params (post-activation,
        3D-filtered — matching gaussian_renderer/__init__.py:252-264).
      point_batch: points per round (static; rounds are the unit of tile work).

    Returns dict(point_cam [Q,3] in camera frame, sampled_depth [Q] z-depth,
                 inside [Q] bool).
    """
    md, in_r, px, py, _t, inside0 = _query(
        points, means3d, scales, rotations, opacities, camera, cfg, alive,
        point_batch, round_batch, _QueryMode.DEPTH)
    pnx = (px - (camera.width - 1) / 2.0) / camera.fx
    pny = (py - (camera.height - 1) / 2.0) / camera.fy
    rln = jax.lax.rsqrt(pnx * pnx + pny * pny + 1.0)
    depth = md * rln
    point_cam = jnp.stack([pnx * depth, pny * depth, depth], axis=-1)
    return dict(point_cam=point_cam, sampled_depth=depth,
                inside=in_r & inside0)


@partial(jax.jit, static_argnames=("cfg", "point_batch", "round_batch"))
def evaluate_sdf(points: jax.Array,
                 means3d, scales, rotations, opacities,
                 camera: Camera, cfg: RasterConfig,
                 alive=None, point_batch: int = 1024, round_batch: int = 64):
    """Single-view SDF: median ray depth at the point's pixel minus the
    point's own ray depth (evaluateSDFCUDA, sample_forward.cu:171-428; bound
    as `evaluate_sdf_from_signle_view` in ext.cpp:18).
    Returns dict(sdf [Q], depth [Q] median ray distance, inside [Q])."""
    md, in_r, _px, _py, t_ray, inside0 = _query(
        points, means3d, scales, rotations, opacities, camera, cfg, alive,
        point_batch, round_batch, _QueryMode.DEPTH)
    return dict(sdf=md - t_ray, depth=md, inside=in_r & inside0)


@partial(jax.jit, static_argnames=("cfg", "point_batch", "round_batch"))
def integrate(points: jax.Array,
              means3d, scales, rotations, opacities,
              camera: Camera, cfg: RasterConfig,
              alive=None, point_batch: int = 1024, round_batch: int = 64):
    """Transmittance of each query point along its camera ray
    (evaluateTransmittanceCUDA). Returns dict(alpha [Q], inside [Q])."""
    tp, covered, _px, _py, _t, inside0 = _query(
        points, means3d, scales, rotations, opacities, camera, cfg, alive,
        point_batch, round_batch, _QueryMode.INTEGRATE)
    # points outside the frustum keep T=1 (alpha 0)
    tp = jnp.where(covered & inside0, tp, 1.0)
    return dict(alpha=1.0 - tp, transmittance=tp, inside=inside0)
