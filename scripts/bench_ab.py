"""Single-process A/B benchmark of the raster hot-path knobs on real TPU.

Runs every configuration inside ONE python process (the axon TPU claim has a
multi-minute cooldown between processes, so per-config subprocesses would
spend more time waiting than measuring):

  - fused u32 sort key on/off          (binning._FUSED_SORT_KEY)
  - quadratic-basis MXU blend 0/2/3    (render_pallas._QUAD_MXU)

The env-var knobs are import-time module constants, so this script flips the
module globals directly and forces a fresh jit entry per config by building a
new wrapper function each time.

Usage: python scripts/bench_ab.py [--iters 8] [--n 100000] [--width 1920]
       [--height 1080] [--out AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--out", default="AB.json")
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--platform", default="",
                    help="force jax platform (cpu for smoke tests; the axon "
                         "jaxlib ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import gsjax.ops.raster.binning as binning_mod
    import gsjax.ops.raster.render_pallas as rp
    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.api import render
    from gsjax.ops.raster.camera import Camera
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
    cfg = RasterConfig(pair_capacity=1 << 21, max_per_tile=1 << 11,
                       sh_degree=3, require_depth=True)
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    dev_args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))

    raw_render = render.__wrapped__   # un-jitted facade

    def make_fn(fwd_only):
        # fresh function object per config -> fresh jit cache entry even
        # though the module globals it closes over have changed
        if fwd_only:
            def fwd(means, scales, quats, opac, shs, gt, bg):
                out = raw_render(means, scales, quats, opac, shs, cam, cfg, bg)
                return out["render"], out["median_depth"], out["num_pairs"]
            return jax.jit(fwd)

        def fwd_bwd(means, scales, quats, opac, shs, gt, bg):
            def loss_fn(m, s, q, o, c):
                out = raw_render(m, s, q, o, c, cam, cfg, bg)
                ll1 = losses.l1_loss(out["render"], gt)
                ssim_val = losses.ssim(out["render"], gt)
                dn = jnp.mean(out["median_depth"]) * 1e-6
                return 0.8 * ll1 + 0.2 * (1 - ssim_val) + dn
            return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                means, scales, quats, opac, shs)
        return jax.jit(fwd_bwd)

    results = {}
    # round-3 ladder: bisect vs Newton median root finder (both include the
    # structural saved-d_denom backward; the round-2 baseline for "bisect"
    # comparisons is BENCH_r02's 333 ms which also paid the backward
    # d_denom re-traversal)
    configs = [
        ("median_bisect", dict(fused=True, quad=0, median="bisect")),
        ("median_newton", dict(fused=True, quad=0, median="newton")),
    ]
    # Sync protocol: jax.block_until_ready is a NO-OP on the axon relay
    # (observed 2026-08-18) — fence with a device-side scalar index + 4-byte
    # host fetch (gsjax.utils.benchsync; fixes ADVICE r2: the old full-leaf
    # np.asarray dragged the whole ~24MB render through the relay in
    # --fwd_only mode, inside both the compile and timed windows).
    from gsjax.utils.benchsync import sync

    for name, knobs in configs:
        binning_mod._FUSED_SORT_KEY = knobs["fused"]
        rp._QUAD_MXU = knobs["quad"]
        rp._MEDIAN_IMPL = knobs.get("median", "newton")
        fn = make_fn(args.fwd_only)
        t0 = time.perf_counter()
        out = fn(*dev_args, gt, bg)
        sync(out)
        compile_s = time.perf_counter() - t0
        # un-timed settle iter, then timed block fenced by a host fetch
        sync(fn(*dev_args, gt, bg))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*dev_args, gt, bg)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        mrays = width * height / dt / 1e6
        results[name] = {"iter_ms": round(dt * 1e3, 2),
                         "mrays_per_s": round(mrays, 3),
                         "compile_s": round(compile_s, 1)}
        print(f"{name}: {dt * 1e3:.1f} ms/iter = {mrays:.2f} Mrays/s "
              f"(compile {compile_s:.0f}s)", flush=True)

    with open(args.out, "w") as f:
        json.dump({"fwd_only": bool(args.fwd_only), "width": width,
                   "height": height, "n": n, "results": results}, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
