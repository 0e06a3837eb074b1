"""Quick fwd-kernel knob sweep on real TPU: median cache slots x Newton
iterations (the two unexplained-cost hypotheses from PROFILE_r03c: VMEM
pressure from the 32 MB chunk cache, and per-evaluation overhead).

Times ONLY the forward blend kernel (depth on) per config — one compile
each. Usage: python scripts/bench_fwd_knobs.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_stages import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gsjax.ops.raster.render_pallas as rp
    from gsjax.ops.raster import RasterConfig, render_ref
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
    tiles_x, tiles_y = cfg.grid(width, height)
    n_tiles = tiles_x * tiles_y
    cam_params = jnp.asarray([cam.fx, cam.fy, 0, 0, 0, width, height, 0],
                             jnp.float32)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)

    prep = jax.jit(lambda *a: preprocess(*a, None, None, None, cam, cfg))(*dev)
    binning = jax.jit(lambda p: bin_gaussians(p, cfg, width, height))(prep)
    feats_t = jax.jit(lambda p, b: rp.pack_features_t(
        render_ref.prepare_pairs(p, b, cfg), cfg))(prep, binning)

    results = {}
    default_lad = [(16, 7, "newton", "switch"),
                   (16, 7, "newton", "flat"),
                   (8, 7, "newton", "switch"),
                   (16, 5, "newton", "switch"),
                   (16, 7, "bisect", "flat")]
    compact_lad = [(16, 7, "newton", "compact"),
                   (16, 7, "newton", "switch")]
    lad = {"compact": compact_lad}.get(os.environ.get("KNOBS", ""),
                                       default_lad)
    if os.environ.get("KNOBS", "") == "subtile":
        for sub in (1, 2, 4, 8):
            rp._SUBTILE = sub
            rp._MEDIAN_EVAL = "compact"
            fwd = jax.jit(lambda ft, st, ct: rp._fwd_call(
                ft, tile_ids, st, ct, cam_params, cfg, tiles_x, n_tiles,
                False))
            timeit(fwd, (feats_t, binning.tile_start, binning.tile_count),
                   args.iters, f"fwd subtile={sub} compact", results)
            bwd = jax.jit(lambda ft, st, ct, res, g: rp._bwd_call(
                ft, tile_ids, st, ct, cam_params, res, g, cfg, tiles_x,
                n_tiles, False))
            res = fwd(feats_t, binning.tile_start, binning.tile_count)
            g = jnp.ones_like(res)
            timeit(bwd, (feats_t, binning.tile_start, binning.tile_count,
                         res, g),
                   args.iters, f"bwd subtile={sub} compact", results)
        lad = []
    for slots, niters, impl, ev in lad:
        rp._MEDIAN_SLOTS = slots
        rp._NEWTON_ITERS = niters
        rp._MEDIAN_IMPL = impl
        rp._MEDIAN_EVAL = ev
        fwd = jax.jit(lambda ft, st, ct: rp._fwd_call(
            ft, tile_ids, st, ct, cam_params, cfg, tiles_x, n_tiles, False))
        timeit(fwd, (feats_t, binning.tile_start, binning.tile_count),
               args.iters, f"fwd slots={slots} it={niters} {impl} {ev}",
               results)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
