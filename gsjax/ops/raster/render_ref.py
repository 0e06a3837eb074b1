"""Tile renderer, pure-XLA differentiable path.

Re-derivation of `renderCUDA` (render_forward.cu:391-671) for TPU: instead of
one CUDA thread marching gaussians per pixel, each 32x32 tile blends a
depth-sorted [chunk, P=1024] block of (gaussian, pixel) interactions at a time.
The sequential transmittance recurrence becomes a cumulative sum of
log(1-alpha) along the gaussian axis, so the whole chunk is data-parallel on
the VPU/MXU and the backward pass falls out of autodiff (no hand-written
warp reductions / atomics as in render_backward.cu:21-53,1035-1065).

Work skipping without dynamic shapes: tiles are processed in count-sorted
batches and every chunk step is guarded by a *scalar* `lax.cond` on the batch
max count — a batch of near-empty tiles runs zero chunk bodies (forward and
backward), which recovers most of the CUDA early-exit behaviour inside static
XLA control flow.

Blend semantics match the CUDA kernel exactly:
  - skip if power > 0 or alpha < 1/255         (render_forward.cu:487-497)
  - alpha = min(0.99, opacity * exp(power))
  - stop (freeze T) when T*(1-alpha) < 1e-4     (render_forward.cu:498-501)
  - colour_out = accum + T_final * bg; alpha_out = 1 - T_final
  - normal_out = accum_normal / (1 - T_final) when any contributor
  - median depth: T>0.5 crossing initialisation + SPLIT-way bisection of the
    per-ray transmittance model T(ts) built from half-gaussian CDF factors
    (render_forward.cu:535-645), returned as z-depth via the ray->z factor rln.

The median-depth output is differentiable through the final interval
interpolation; as the interval shrinks (0.8 / 8^5 after 5 iterations) its
autodiff gradient converges to the implicit-function derivative that the
reference hand-codes in render_backward.cu:832-880.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.ops.raster.binning import Binning
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import Preprocessed

# payload layout: mean2d(2) conic(3) opacity(1) color(3) ray_plane(4) normal(3)
_F = 16


def _pack_features(prep: Preprocessed) -> jax.Array:
    return jnp.concatenate([
        prep.mean2d,
        prep.conic,
        prep.opacity[:, None],
        prep.color,
        prep.ray_plane,
        prep.normal,
    ], axis=-1)


def _alpha_terms(feats, px, py, cfg: RasterConfig, entry_valid):
    """Shared per-chunk alpha computation. feats: [C,F]; px,py: [P]."""
    gx = feats[:, 0:1]
    gy = feats[:, 1:2]
    ca = feats[:, 2:3]
    cb = feats[:, 3:4]
    cc = feats[:, 4:5]
    op = feats[:, 5:6]
    dx = gx - px[None, :]                     # [C,P]
    dy = gy - py[None, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(cfg.alpha_clamp, op * jnp.exp(jnp.minimum(power, 0.0)))
    passes = (power <= 0.0) & (alpha >= cfg.alpha_min) & entry_valid[:, None]
    a = jnp.where(passes, alpha, 0.0)
    return a, passes, dx, dy


def _tile_pixels(tile_id, tiles_x, cfg: RasterConfig):
    t = cfg.tile
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    col = jnp.arange(t * t, dtype=jnp.int32) % t
    row = jnp.arange(t * t, dtype=jnp.int32) // t
    px = (tx * t + col).astype(jnp.float32)
    py = (ty * t + row).astype(jnp.float32)
    return px, py


def prepare_pairs(prep: Preprocessed, binning: Binning, cfg: RasterConfig) -> jax.Array:
    """Gather per-pair features in sorted order, sanitised and padded so
    per-tile dynamic slices never clamp."""
    # barrier: fused with downstream math this row-gather lowers to a serial
    # loop on TPU (see binning.py)
    feats_pairs = jax.lax.optimization_barrier(
        _pack_features(prep)[binning.gauss_idx])
    # `where`, not multiply: padding pairs may gather dead (even NaN) rows and
    # NaN * 0 would poison the blend.
    feats_pairs = jnp.where(binning.pair_valid[:, None], feats_pairs, 0.0)
    return jnp.concatenate(
        [feats_pairs, jnp.zeros((cfg.chunk, _F), feats_pairs.dtype)], axis=0)


def _chunk_blend(carry, feats_pairs, base_rel, start, count, px, py,
                 cfg: RasterConfig):
    """Blend one [chunk] slice of a tile's sorted gaussian list into the
    per-pixel carry (sequential CUDA loop -> cumulative log-transmittance)."""
    chunk = cfg.chunk
    log_tmin = math.log(cfg.transmittance_min)
    log_t, c_acc, n_acc, last_idx, md_init = carry
    base = start + base_rel
    feats = jax.lax.dynamic_slice(feats_pairs, (base, 0), (chunk, _F))
    rel = base_rel + jnp.arange(chunk, dtype=jnp.int32)
    entry_valid = rel < count
    a, passes, dx, dy = _alpha_terms(feats, px, py, cfg, entry_valid)
    log1m = jnp.log1p(-a)                                  # [C,P]
    l_incl = log_t[None, :] + jnp.cumsum(log1m, axis=0)
    keep = l_incl >= log_tmin
    l_prev = l_incl - log1m
    w = a * jnp.exp(l_prev) * keep                          # blend weights
    hp = jax.lax.Precision.HIGHEST
    c_acc = c_acc + jnp.einsum("kp,kc->pc", w, feats[:, 6:9], precision=hp)
    n_acc = n_acc + jnp.einsum("kp,kc->pc", w, feats[:, 13:16], precision=hp)
    # median-depth init: last applied gaussian whose preceding T > 0.5
    # (ray_plane = columns 9:13 -> rp0, rp1, tc, rsigma)
    t_val = feats[:, 9:10] * dx + feats[:, 10:11] * dy + feats[:, 11:12]
    applied = passes & keep
    cond = applied & (jnp.exp(l_prev) > 0.5)
    k_ids = jnp.arange(chunk, dtype=jnp.int32)[:, None]
    best = jnp.max(jnp.where(cond, k_ids, -1), axis=0)      # [P]
    md_chunk = jnp.take_along_axis(t_val, jnp.maximum(best, 0)[None, :], axis=0)[0]
    md_init = jnp.where(best >= 0, md_chunk, md_init)
    last_idx = jnp.maximum(last_idx, jnp.max(jnp.where(applied, rel[:, None], -1), axis=0))
    log_t = log_t + jnp.sum(log1m * keep, axis=0)
    return (log_t, c_acc, n_acc, last_idx, md_init)


def blend_tiles_batch(feats_pairs, tile_ids, starts, counts, tiles_x,
                      cfg: RasterConfig, bg, width, height, fx, fy):
    """Blend a batch of tiles. tile_ids/starts/counts: [B]. Returns dict of
    [B, P(, C)] per-pixel outputs. Chunk steps beyond the batch max count are
    skipped via a scalar lax.cond (fwd AND bwd)."""
    b = tile_ids.shape[0]
    p = cfg.pixels_per_tile
    chunk = cfg.chunk
    n_chunks = -(-cfg.max_per_tile // chunk)

    pxs, pys = jax.vmap(lambda t: _tile_pixels(t, tiles_x, cfg))(tile_ids)
    bmax = jnp.max(counts)

    carry0 = (jnp.zeros((b, p)), jnp.zeros((b, p, 3)), jnp.zeros((b, p, 3)),
              jnp.full((b, p), -1, jnp.int32), jnp.zeros((b, p)))

    @partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
    def step(carry, c):
        def do(cr):
            return jax.vmap(
                lambda cr_, s, cnt, px, py: _chunk_blend(
                    cr_, feats_pairs, c * chunk, s, cnt, px, py, cfg)
            )(cr, starts, counts, pxs, pys)
        return jax.lax.cond(c * chunk < bmax, do, lambda cr: cr, carry), None

    carry, _ = jax.lax.scan(step, carry0, jnp.arange(n_chunks, dtype=jnp.int32))
    log_t, c_acc, n_acc, last_idx, md_init = carry
    t_final = jnp.exp(log_t)
    out = dict(
        color=c_acc + t_final[..., None] * bg[None, None, :],
        alpha=1.0 - t_final,
        n_contrib=(last_idx + 1).astype(jnp.int32),
        normal=jnp.where((last_idx >= 0)[..., None],
                         n_acc / jnp.maximum(1.0 - t_final, 1e-12)[..., None],
                         0.0),
    )
    if cfg.require_depth:
        out["median_depth"] = _median_depth_batch(
            feats_pairs, starts, last_idx + 1, md_init, t_final, pxs, pys,
            width, height, fx, fy, cfg)
    else:
        out["median_depth"] = jnp.zeros((b, p))
    return out


def _median_depth_batch(feats_pairs, starts, n_contrib, md_init, t_final,
                        pxs, pys, width, height, fx, fy, cfg: RasterConfig):
    """Median z-depth for the render path: ray-distance bisection + ray->z."""
    m_depth, _ = bisect_batch(feats_pairs, starts, n_contrib, md_init,
                              t_final, pxs, pys, cfg)
    # ray distance -> z depth (render_forward.cu:421-422, 656)
    pnx = (pxs - (width - 1) / 2.0) / fx
    pny = (pys - (height - 1) / 2.0) / fy
    rln = jax.lax.rsqrt(pnx * pnx + pny * pny + 1.0)
    return m_depth * rln


def bisect_batch(feats_pairs, starts, n_contrib, md_init, t_final,
                 pxs, pys, cfg: RasterConfig):
    """SPLIT-way transmittance bisection for T(t*)=0.5 (render_forward.cu:535-645),
    batched over tiles/rounds with scalar-cond chunk skipping.

    Generic over what a "pixel" is: pxs/pys may be a tile's fixed grid (render)
    or arbitrary projected query points (sample_depth, sample_forward.cu:591-700).
    Returns (median ray distance [B,P], in_range [B,P] bool)."""
    b, p = md_init.shape
    chunk = cfg.chunk
    n_chunks = -(-cfg.max_per_tile // chunk)
    s_pts = cfg.split + 1

    in_range = t_final <= cfg.min_transmittance
    d_min = jnp.maximum(md_init - cfg.sample_range, 0.0)
    d_max = jnp.maximum(md_init + cfg.sample_range, 0.0)
    # CUDA bisection revisits only entries below the tile's max contributor
    bmax = jnp.max(n_contrib)

    def chunk_log_tp(log_tp, c, start, n_con, px, py, ts):
        """One tile, one chunk. ts: [P, S]; log_tp: [P, S]."""
        base = start + c * chunk
        feats = jax.lax.dynamic_slice(feats_pairs, (base, 0), (chunk, _F))
        rel = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        entry_valid = rel < n_con.max()
        a, passes, dx, dy = _alpha_terms(feats, px, py, cfg, entry_valid)
        applied = passes & (rel[:, None] < n_con[None, :])
        a = jnp.where(applied, a, 0.0)
        t_peak = feats[:, 9:10] * dx + feats[:, 10:11] * dy + feats[:, 11:12]
        rsig = feats[:, 12:13]                                   # [C,1]
        contrib = []
        for s in range(s_pts):
            tss = ts[None, :, s]                                 # [1,P]
            delta = (tss - t_peak) * rsig
            g = jnp.where(rsig > 0, jnp.exp(-0.5 * delta * delta), 0.0)
            one_minus = jnp.maximum(1.0 - a * g, 1e-12)
            log_factor = jnp.where(
                tss > t_peak,
                jnp.log1p(-a) - 0.5 * jnp.log(one_minus),
                0.5 * jnp.log(one_minus),
            )
            contrib.append(jnp.sum(log_factor * applied, axis=0))
        return log_tp + jnp.stack(contrib, axis=-1)

    def eval_tp(d_min, d_max):
        interval = (d_max - d_min) / cfg.split
        ts = d_min[..., None] + interval[..., None] * \
            jnp.arange(s_pts, dtype=jnp.float32)

        @partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
        def step(log_tp, c):
            def do(lt):
                return jax.vmap(
                    lambda lt_, s, nc, px, py, t: chunk_log_tp(lt_, c, s, nc, px, py, t)
                )(lt, starts, n_contrib, pxs, pys, ts)
            return jax.lax.cond(c * chunk < bmax, do, lambda lt: lt, log_tp), None

        log_tp, _ = jax.lax.scan(step, jnp.zeros((b, p, s_pts)),
                                 jnp.arange(n_chunks, dtype=jnp.int32))
        return jnp.exp(log_tp), interval

    t0 = t1 = None
    for it in range(cfg.split_iterations):
        tp, interval = eval_tp(d_min, d_max)
        if it == 0:
            in_range = in_range & (tp[..., 0] >= 0.5) & (tp[..., cfg.split] <= 0.5)
        # last s in [1, SPLIT-1] with T>=0.5, else 0 (render_forward.cu:627-631)
        sid = jnp.zeros((b, p), jnp.int32)
        for s in range(1, cfg.split):
            sid = jnp.where(tp[..., s] >= 0.5, s, sid)
        d_max = d_min + (sid + 1).astype(jnp.float32) * interval
        d_min = d_min + sid.astype(jnp.float32) * interval
        t0 = jnp.take_along_axis(tp, sid[..., None], axis=-1)[..., 0]
        t1 = jnp.take_along_axis(tp, (sid + 1)[..., None], axis=-1)[..., 0]

    denom = t0 - t1
    w_max = jnp.clip((t0 - 0.5) / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20),
                     0.0, 1.0)
    m_depth = jnp.where(in_range, w_max * d_max + (1.0 - w_max) * d_min, 0.0)
    return m_depth, in_range


def render_tiles(prep: Preprocessed, binning: Binning, camera: Camera,
                 cfg: RasterConfig, bg: jax.Array):
    """Blend all tiles (count-sorted batches). Returns dict of [H,W,*] images."""
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    num_tiles = tiles_x * tiles_y

    feats_pairs = prepare_pairs(prep, binning, cfg)

    num_batches = -(-num_tiles // cfg.tile_batch)
    t_pad = num_batches * cfg.tile_batch
    tile_ids = jnp.arange(t_pad, dtype=jnp.int32)
    in_b = tile_ids < num_tiles
    safe = jnp.minimum(tile_ids, num_tiles - 1)
    starts = jnp.where(in_b, binning.tile_start[safe], 0)
    counts = jnp.where(in_b, binning.tile_count[safe], 0)

    # heavy tiles first so each batch is roughly homogeneous in count
    order = jnp.argsort(-counts)
    inv_order = jnp.argsort(order)
    tile_ids_s = tile_ids[order]
    starts_s = starts[order]
    counts_s = counts[order]

    def batch_body(_, bidx):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, bidx * cfg.tile_batch,
                                                    cfg.tile_batch)
        return None, blend_tiles_batch(
            feats_pairs, sl(tile_ids_s), sl(starts_s), sl(counts_s), tiles_x,
            cfg, bg, camera.width, camera.height, camera.fx, camera.fy)

    _, outs = jax.lax.scan(batch_body, None, jnp.arange(num_batches))
    # outs leaves: [num_batches, tile_batch, P, ...]; undo count sort
    def fix(v):
        v = v.reshape((t_pad,) + v.shape[2:])[inv_order]
        return _assemble(v, tiles_x, tiles_y, camera.width, camera.height, cfg)

    return {k: fix(v) for k, v in outs.items()}


def _assemble(v, tiles_x, tiles_y, width, height, cfg: RasterConfig):
    """[T_pad, P(, C)] tile blocks -> [H, W(, C)] image."""
    t = cfg.tile
    ch = v.shape[2:] if v.ndim > 2 else ()
    v = v[: tiles_x * tiles_y]
    v = v.reshape((tiles_y, tiles_x, t, t) + ch)
    v = jnp.moveaxis(v, 2, 1).reshape((tiles_y * t, tiles_x * t) + ch)
    return v[:height, :width]
