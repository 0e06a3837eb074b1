"""Stage-level profile of the 1080p fwd+bwd train step on real TPU.

Round-2's levers were chosen from a cycle-count cost model that hardware
falsified (AB_r02: quad-MXU -7%). This script replaces the model with
measurements: each stage is jitted separately with its inputs passed as
arguments, timed with a device-side scalar fence (ADVICE r2: fetching a
full leaf skews numbers by the relay transfer time; we index a scalar
on-device and fetch 4 bytes).

Also reports the workload statistics that decide the next levers:
  - live pairs vs the 2^21 static sort capacity (two-level sort lever)
  - per-tile pair counts (chunk padding waste at G=128)
  - n_contrib / saturation depth (how much of the marched work is dead
    vs the CUDA per-pixel early exit, render_forward.cu:498-500)

Optionally captures a jax.profiler trace (--trace DIR).

Usage: python scripts/profile_stages.py [--iters 10] [--n 100000]
       [--trace DIR] [--fast] [--out PROFILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(out):
    """Fence: device-side scalar index, 4-byte host fetch (ADVICE r2)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timeit(fn, args, iters, label, results):
    import time
    sync(fn(*args))          # compile
    sync(fn(*args))          # settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[label] = round(ms, 2)
    print(f"{label:34s} {ms:9.2f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--trace", default="")
    ap.add_argument("--fast", action="store_true",
                    help="skip the slowest stages (bwd variants)")
    ap.add_argument("--out", default="")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster import render_pallas, render_ref
    from gsjax.ops.raster.api import render
    from gsjax.ops.raster.binning import bin_gaussians
    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.raster.preprocess import preprocess
    from gsjax.train import losses

    width, height, n = args.width, args.height, args.n
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
    cfg = RasterConfig(pair_capacity=1 << 21, live_capacity=1 << 20,
                       max_per_tile=1 << 11,
                       sh_degree=3, require_depth=True)
    cfg_nd = RasterConfig(pair_capacity=1 << 21, live_capacity=1 << 20,
                       max_per_tile=1 << 11,
                          sh_degree=3, require_depth=False)
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    dev = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    tiles_x, tiles_y = cfg.grid(width, height)
    n_tiles = tiles_x * tiles_y
    cam_params = jnp.asarray([cam.fx, cam.fy, 0, 0, 0, width, height, 0],
                             jnp.float32)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    interp = jax.default_backend() != "tpu"

    results = {}
    iters = args.iters

    # --- stages, cumulative then isolated -----------------------------------
    prep_fn = jax.jit(lambda *a: preprocess(*a, None, None, None, cam, cfg))
    prep = timeit(prep_fn, dev, iters, "preprocess", results)

    bin_fn = jax.jit(lambda p: bin_gaussians(p, cfg, width, height))
    binning = timeit(bin_fn, (prep,), iters, "binning (expand+sort+lay)",
                     results)

    # sort alone, on the real key distribution
    k = cfg.pair_capacity
    key_probe = jnp.asarray(
        rng.integers(0, 1 << 31, size=(k,), dtype=np.int64).astype(np.uint32))
    pay_probe = jnp.asarray(rng.integers(0, n, size=(k,), dtype=np.int32))
    sort_fn = jax.jit(lambda kk, pp: jax.lax.sort((kk, pp), num_keys=1))
    timeit(sort_fn, (key_probe, pay_probe), iters,
           f"lax.sort u32+i32 @ 2^{k.bit_length()-1}", results)

    pack_fn = jax.jit(lambda p, b: render_pallas.pack_features_t(
        render_ref.prepare_pairs(p, b, cfg), cfg))
    feats_t = timeit(pack_fn, (prep, binning), iters, "prepare_pairs + pack",
                     results)

    fwd_fn = jax.jit(lambda ft, st, ct: render_pallas._fwd_call(
        ft, tile_ids, st, ct, cam_params, cfg, tiles_x, n_tiles, interp))
    out = timeit(fwd_fn, (feats_t, binning.tile_start, binning.tile_count),
                 iters, "fwd kernel (depth)", results)

    fwd_nd = jax.jit(lambda ft, st, ct: render_pallas._fwd_call(
        ft, tile_ids, st, ct, cam_params, cfg_nd, tiles_x, n_tiles, interp))
    timeit(fwd_nd, (feats_t, binning.tile_start, binning.tile_count),
           iters, "fwd kernel (no depth)", results)

    g_out = jnp.ones_like(out)
    bwd_fn = jax.jit(lambda ft, st, ct, o, g: render_pallas._bwd_call(
        ft, tile_ids, st, ct, cam_params, o, g, cfg, tiles_x, n_tiles,
        interp))
    timeit(bwd_fn, (feats_t, binning.tile_start, binning.tile_count,
                    out, g_out), iters, "bwd kernel (depth)", results)

    if not args.fast:
        bwd_nd = jax.jit(lambda ft, st, ct, o, g: render_pallas._bwd_call(
            ft, tile_ids, st, ct, cam_params, o, g, cfg_nd, tiles_x, n_tiles,
            interp))
        timeit(bwd_nd, (feats_t, binning.tile_start, binning.tile_count,
                        out, g_out), iters, "bwd kernel (no depth)", results)

        # VJP regather: d_feats [16, K_pad] -> per-gaussian grads (the
        # scatter-add transpose of prepare_pairs' row gather)
        d_ft = jnp.ones_like(feats_t)
        regather_fn = jax.jit(lambda p, b, d: jax.vjp(
            lambda pp: render_pallas.pack_features_t(
                render_ref.prepare_pairs(pp, b, cfg), cfg), p)[1](d))
        timeit(regather_fn, (prep, binning, d_ft), iters,
               "pair-grad regather (VJP)", results)

        # preprocess VJP (cov2D/SH/ray-plane backward via XLA autodiff)
        d_prep = jax.tree.map(jnp.ones_like, prep)
        prep_bwd = jax.jit(lambda a_, d: jax.vjp(
            lambda *aa: preprocess(*aa, None, None, None, cam, cfg), *a_)[1](d))
        timeit(prep_bwd, (dev, d_prep), iters, "preprocess VJP", results)

    # losses fwd+bwd on fixed images
    img = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    loss_fn = jax.jit(jax.grad(lambda im: 0.8 * losses.l1_loss(im, gt) +
                               0.2 * (1 - losses.ssim(im, gt))))
    timeit(loss_fn, (img,), iters, "l1+ssim fwd+bwd", results)

    # full step (= bench.py)
    def full(m, s, q, o, c, gt, bg):
        def lf(m, s, q, o, c):
            r = render.__wrapped__(m, s, q, o, c, cam, cfg, bg)
            return (0.8 * losses.l1_loss(r["render"], gt) +
                    0.2 * (1 - losses.ssim(r["render"], gt)) +
                    jnp.mean(r["median_depth"]) * 1e-6)
        return jax.value_and_grad(lf, argnums=(0, 1, 2, 3, 4))(m, s, q, o, c)
    full_fn = jax.jit(full)
    timeit(full_fn, dev + (gt, bg), iters, "FULL fwd+bwd step", results)

    # fwd-only full (render path as served)
    fwdfull_fn = jax.jit(lambda *a: render.__wrapped__(*a, cam, cfg, bg))
    timeit(fwdfull_fn, dev, iters, "FULL fwd only", results)

    # --- workload statistics -------------------------------------------------
    stats = {}
    stats["num_pairs"] = int(binning.num_pairs)
    stats["pair_capacity"] = int(cfg.pair_capacity)
    stats["fill"] = round(float(binning.num_pairs) / cfg.pair_capacity, 4)
    tc = np.asarray(binning.tile_count)
    stats["tiles"] = int(n_tiles)
    stats["tile_count_mean"] = round(float(tc.mean()), 1)
    stats["tile_count_p50"] = int(np.percentile(tc, 50))
    stats["tile_count_p90"] = int(np.percentile(tc, 90))
    stats["tile_count_max"] = int(tc.max())
    # chunk padding waste at G=128
    g = 128
    chunks = np.ceil(tc / g).sum()
    stats["chunk_pad_waste"] = round(float(chunks * g / max(tc.sum(), 1)), 3)
    # saturation: n_contrib per pixel vs tile counts => marched dead work
    nc = np.asarray(out[:, 8, :])          # [T, P] n_contrib
    stats["n_contrib_mean"] = round(float(nc.mean()), 1)
    stats["n_contrib_p90"] = round(float(np.percentile(nc, 90)), 1)
    # chunks the while_loop marches: until ALL pixels saturate => per-tile
    # max n_contrib is a lower bound on marched pairs
    nc_tile_max = nc.max(axis=1)
    marched = np.minimum(np.ceil(nc_tile_max / g) * g,
                         np.ceil(tc / g) * g)
    stats["marched_pairs_per_tile_mean"] = round(float(marched.mean()), 1)
    stats["useful_frac_of_marched"] = round(
        float(nc.mean()) / max(float(marched.mean()), 1e-9), 3)
    rad = np.asarray(prep.radius)
    vis = rad[rad > 0]
    stats["visible_gaussians"] = int((rad > 0).sum())
    stats["radius_px_p50"] = round(float(np.percentile(vis, 50)), 1) if len(vis) else 0
    stats["radius_px_p90"] = round(float(np.percentile(vis, 90)), 1) if len(vis) else 0

    print(json.dumps(stats, indent=1), flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out2 = full_fn(*dev, gt, bg)
            sync(out2)
        print(f"trace written to {args.trace}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"timings_ms": results, "stats": stats,
                       "n": n, "width": width, "height": height}, f, indent=1)


if __name__ == "__main__":
    main()
