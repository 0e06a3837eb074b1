"""Micro-benchmarks for the non-kernel hot stages on real TPU.

Round-3 profiling (PROFILE_r03b) accounts the full 308 ms step; after the
blend kernels the big line items are the pair-grad regather (41.5 ms — the
VJP scatter-add of `table[gauss_idx]`), binning's non-sort work (~32 ms),
and prepare_pairs+pack (16.7 ms). This measures the candidate replacements
on the bench workload so the winners are chosen from numbers:

  regather:
    r0 unsorted scatter-add (status quo: VJP of table[gauss_idx])
    r1 segment_sum over expansion order (sorted ids + indices_are_sorted)
    r2 cumsum-diff over expansion order (speed reference; known
       cancellation hazard, NOT a candidate for gradients)
  binning pieces: expansion spreads, packed gather, key+sort, re-layout.

Usage: python scripts/profile_micro.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_stages import sync, timeit  # noqa: E402,F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--platform", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.binning import bin_gaussians
    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.raster.preprocess import preprocess

    width, height, n = 1920, 1080, 100_000
    rng = np.random.default_rng(0)
    means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    means[:, 2] += 5.0
    scales = np.exp(rng.normal(-3.3, 0.3, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(0.0, 1.0, (n, 1))))).astype(np.float32)
    shs = rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32)
    cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        1.0, 0.66, width, height)
    cfg = RasterConfig(pair_capacity=1 << 21, max_per_tile=1 << 11,
                       sh_degree=3, require_depth=True)
    dev = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    prep = jax.jit(lambda *a: preprocess(*a, None, None, None, cam, cfg))(*dev)
    binning = jax.jit(lambda p: bin_gaussians(p, cfg, width, height))(prep)
    k = cfg.pair_capacity
    k_al = binning.gauss_idx.shape[0]
    results = {}
    it = args.iters

    # ---- regather candidates -------------------------------------------------
    table = jnp.asarray(rng.normal(0, 1, (n, 16)).astype(np.float32))
    d_al = jnp.asarray(rng.normal(0, 1, (k_al, 16)).astype(np.float32))

    r0 = jax.jit(lambda t, gi, d: jax.vjp(lambda tt: tt[gi], t)[1](d)[0])
    timeit(r0, (table, binning.gauss_idx, d_al), it,
           "regather r0 scatter-add", results)

    # expansion-order quantities (host-side rebuild of binning internals)
    touched = np.asarray(prep.tiles_touched)
    touched = np.where(np.asarray(prep.valid), touched, 0)
    cum = np.cumsum(touched)
    total = int(cum[-1])
    starts_exc = (cum - touched).astype(np.int32)
    # owner gaussian per expansion slot
    g_exp = np.zeros((k,), np.int32)
    mark = np.zeros((k,), np.int32)
    ids = np.arange(n, dtype=np.int32)
    w = touched > 0
    mark[starts_exc[w]] = ids[w]
    g_exp = np.maximum.accumulate(mark)
    g_exp_d = jnp.asarray(g_exp)
    # aligned slot of each expansion pair (inverse of sort+relayout):
    # reconstruct from binning by sorting aligned slots by (gauss? no) —
    # here we only need SOME permutation with sorted segment ids to measure
    # the segment_sum cost; use argsort of gauss_idx as a stand-in with the
    # same distribution.
    perm = jnp.argsort(binning.gauss_idx)

    def r1(d, pm, ge):
        d_exp = d[pm][:k]
        return jax.ops.segment_sum(d_exp, ge, num_segments=n,
                                   indices_are_sorted=True)
    timeit(jax.jit(r1), (d_al, perm, g_exp_d), it,
           "regather r1 sorted segsum", results)

    def r2(d, pm, se):
        d_exp = d[pm][:k]
        cs = jnp.cumsum(d_exp, axis=0)
        ends = jnp.minimum(se + jnp.asarray(touched, jnp.int32), k) - 1
        hi = cs[jnp.maximum(ends, 0)]
        lo = jnp.where((se > 0)[:, None], cs[jnp.maximum(se - 1, 0)], 0.0)
        return hi - lo
    timeit(jax.jit(r2), (d_al, perm, jnp.asarray(starts_exc)), it,
           "regather r2 cumsum-diff", results)

    # pieces: permutation gather alone, segment_sum alone (pre-permuted)
    timeit(jax.jit(lambda d, pm: d[pm]), (d_al, perm), it,
           "  [k_al,16] row permute", results)
    d_exp0 = jax.jit(lambda d, pm: d[pm][:k])(d_al, perm)
    timeit(jax.jit(lambda d, ge: jax.ops.segment_sum(
        d, ge, num_segments=n, indices_are_sorted=True)),
        (d_exp0, g_exp_d), it, "  sorted segsum alone", results)
    timeit(jax.jit(lambda d, ge: jax.ops.segment_sum(
        d, ge, num_segments=n, indices_are_sorted=False)),
        (d_exp0, g_exp_d), it, "  unsorted segsum alone", results)

    # ---- binning pieces -------------------------------------------------------
    p_ids = jnp.arange(k, dtype=jnp.int32)
    tch = jnp.asarray(touched.astype(np.int32))
    se_d = jnp.asarray(starts_exc)

    def expand(tch, se):
        g_ids = jnp.arange(n, dtype=jnp.int32)
        mark = jnp.zeros((k,), jnp.int32).at[
            jnp.where(tch > 0, se, k)].set(g_ids, mode="drop")
        return jax.lax.cummax(mark)
    timeit(jax.jit(expand), (tch, se_d), it, "bin: mark+cummax", results)

    packed_tbl = jnp.asarray(rng.normal(0, 1, (n, 5)).astype(np.float32))
    g_d = jax.jit(expand)(tch, se_d)
    timeit(jax.jit(lambda t, g: t[g]), (packed_tbl, g_d), it,
           "bin: [k,5] row gather", results)

    key_probe = jnp.asarray(rng.integers(0, 1 << 31, size=(k,),
                                         dtype=np.int64).astype(np.uint32))
    timeit(jax.jit(lambda kk, g, p: jax.lax.sort((kk, g, p), num_keys=1)),
           (key_probe, g_d, p_ids), it, "bin: sort u32+2 payloads", results)
    timeit(jax.jit(lambda kk, g: jax.lax.sort((kk, g), num_keys=1)),
           (key_probe, g_d), it, "bin: sort u32+1 payload", results)

    sorted_g = jnp.asarray(rng.integers(0, n, size=(k,), dtype=np.int32))
    src = jnp.asarray(rng.integers(0, k, size=(k_al,), dtype=np.int32))
    timeit(jax.jit(lambda s, i: s[i]), (sorted_g, src), it,
           "bin: [k_al] i32 gather", results)
    vals = jnp.asarray(rng.integers(0, k_al, size=(k,), dtype=np.int32))
    timeit(jax.jit(lambda v: jnp.full((k,), -1, jnp.int32).at[v].set(
        p_ids, mode="drop")), (vals,), it, "bin: [k] i32 scatter-set",
        results)

    # prepare_pairs pieces
    table16 = jnp.asarray(rng.normal(0, 1, (n, 16)).astype(np.float32))
    gi = binning.gauss_idx
    timeit(jax.jit(lambda t, g: t[g]), (table16, gi), it,
           "pairs: [k_al,16] row gather", results)
    rows = jax.jit(lambda t, g: t[g])(table16, gi)
    timeit(jax.jit(lambda r: jnp.pad(r.T, ((0, 0), (0, cfg.max_per_tile +
                                                    ((-k_al) % 128))))),
           (rows,), it, "pairs: transpose+pad", results)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
