"""Analytic strong-scaling model for the tiles-sharded train step.

Real multi-chip hardware is not reachable from this environment (1 chip via
the axon relay), and a virtual CPU mesh measures only core oversubscription.
This model predicts the strong-scaling efficiency a v4/v5e pod slice would
show, from quantities that ARE measurable here, so a future 2-host run can
falsify it term by term:

  t_step(n) = t_prep / n                     (per-gaussian work, sharded over
                                              gaussians since round 4:
                                              preprocess fwd + its VJP)
            + t_repl                         (replicated residue: Adam update
                                              + densification stats, ~2 ms)
            + t_band * share_max(n)          (binning + blend + banded losses)
            + t_gather(n) + t_psum(n) + t_prep_ag(n)   (ICI collectives)

  - t_prep / t_band come from the measured single-chip stage profile
    (scripts/profile_stages.py -> PROFILE_r04.json); t_prep now counts the
    preprocess VJP too (it was replicated work mis-filed under t_band in the
    round-3 model).
  - share_max(n): the largest per-device pair share under the Trainer's
    equal-pair contiguous row partition (`balance_band_bounds`), computed on
    the real per-tile-row pair histogram of the bench scene. This is the
    load-imbalance term; equal-ROW bands would use the much worse
    rows-share instead (printed for comparison).
  - t_gather: the frame all_gather (color+normal+alpha+depth tile buffers;
    every device receives the full frame) at `ici_gbps`.
  - t_psum: parameter-gradient reduce (capacity x 59 f32, bidirectional
    ring => ~2x payload/n per hop aggregate ~ payload/BW).

Usage: python scripts/scaling_model.py [--profile PROFILE_r03.json]
       [--ici_gbps 90] [--out SCALING_MODEL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene_row_hist(width=1920, height=1080, n=100_000):
    """Per-tile-row pair histogram of the bench scene (hardware-independent;
    computed on CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.binning import bin_gaussians
    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.raster.preprocess import preprocess

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
    prep = preprocess(*map(jnp.asarray, (means, scales, quats, opac, shs)),
                      None, None, None, cam, cfg)
    binning = bin_gaussians(prep, cfg, width, height)
    tiles_x, tiles_y = cfg.grid(width, height)
    tc = np.asarray(binning.tile_count).reshape(tiles_y, tiles_x)
    return tc.sum(axis=1), tiles_x, tiles_y, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="PROFILE_r04.json")
    ap.add_argument("--ici_gbps", type=float, default=90.0,
                    help="per-device ICI bandwidth (v4 ~ 3x2x100GB/s links; "
                         "90 GB/s effective per collective is conservative)")
    ap.add_argument("--capacity", type=int, default=100_000)
    ap.add_argument("--t_repl_ms", type=float, default=2.0,
                    help="measured replicated residue (Adam update + "
                         "densify stats) — scripts/measure_trepl.py on the "
                         "real chip; the 2.0 default is the round-3 guess")
    ap.add_argument("--out", default="SCALING_MODEL.json")
    args = ap.parse_args()

    from gsjax.parallel.shard import (balance_band_bounds,
                                      dual_balance_bounds,
                                      paired_balance_bounds)

    hist, tiles_x, tiles_y, cfg = bench_scene_row_hist()
    total = float(hist.sum())

    with open(args.profile) as f:
        prof = json.load(f)["timings_ms"]
    t_prep = prof["preprocess"] + prof.get("preprocess VJP", 0.0)
    t_repl = args.t_repl_ms   # Adam update + densify stats (measured via
    #                           scripts/measure_trepl.py; r3-r4 guessed 2.0)
    t_full = prof["FULL fwd+bwd step"]
    # everything that scales with the band share: all but prep + repl
    t_band = t_full - t_prep - t_repl

    # collective payloads
    p = cfg.pixels_per_tile
    frame_bytes = tiles_x * tiles_y * p * (3 + 3 + 1 + 1) * 4   # tile buffers
    grad_bytes = args.capacity * 59 * 4
    # sharded-preprocess all_gather: ~24 f32 screen-space rows + 16x3 color
    prep_bytes = args.capacity * 24 * 4

    rows = []
    for n_dev in (1, 2, 4, 8, 16):
        if n_dev == 1:
            share_max = 1.0
            share_rows = 1.0
            t_coll = 0.0
        else:
            rpm = min(tiles_y, -(-tiles_y // n_dev) * 2)
            # best of: single contiguous equal-pair bands vs mirrored dual
            # bands with hill-climbed boundaries (device d owns bands d and
            # 2n-1-d) — the Trainer picks the same way (loop.band_kwargs)
            b = balance_band_bounds(hist, n_dev, rpm)
            shares = np.array([hist[b[d]:b[d + 1]].sum()
                               for d in range(n_dev)], np.float64)
            if tiles_y >= 2 * n_dev:
                b2 = dual_balance_bounds(hist, n_dev, max(rpm // 2, 1))
                shares2 = np.array(
                    [hist[b2[d]:b2[d + 1]].sum() +
                     hist[b2[2 * n_dev - 1 - d]:b2[2 * n_dev - d]].sum()
                     for d in range(n_dev)], np.float64)
                if shares2.max() < shares.max():
                    shares = shares2
                # free heavy-with-light band matching (round 5): the
                # mirrored pairing couples the two CENTRE bands
                b3, p3 = paired_balance_bounds(hist, n_dev, rpm)
                shares3 = np.array(
                    [hist[b3[p3[d, 0]]:b3[p3[d, 0] + 1]].sum() +
                     hist[b3[p3[d, 1]]:b3[p3[d, 1] + 1]].sum()
                     for d in range(n_dev)], np.float64)
                if shares3.max() < shares.max():
                    shares = shares3
            share_max = float(shares.max()) / total
            be = np.minimum(np.arange(n_dev + 1) * (-(-tiles_y // n_dev)),
                            tiles_y)
            share_rows = float(max(hist[be[d]:be[d + 1]].sum()
                                   for d in range(n_dev))) / total
            # ring all_gather: each device receives (n-1)/n of the frame;
            # psum (reduce-scatter + all-gather) moves ~2x(n-1)/n of grads
            bw = args.ici_gbps * 1e9
            t_coll = (frame_bytes * (n_dev - 1) / n_dev / bw +
                      2 * grad_bytes * (n_dev - 1) / n_dev / bw +
                      prep_bytes * (n_dev - 1) / n_dev / bw) * 1e3
        t_n = t_prep / n_dev + t_repl + t_band * share_max + t_coll
        eff = (t_prep + t_repl + t_band) / (n_dev * t_n)
        rows.append({
            "devices": n_dev,
            "pred_step_ms": round(t_n, 2),
            "share_max_balanced": round(share_max, 4),
            "share_max_equal_rows": round(share_rows, 4),
            "collective_ms": round(t_coll, 3),
            "pred_efficiency": round(eff, 4),
        })
        print(rows[-1], flush=True)

    out = {
        "model": "t(n) = t_prep + t_band*share_max(n) + ici_collectives(n)",
        "inputs": {
            "profile": args.profile,
            "t_prep_ms": t_prep,
            "t_repl_ms": t_repl,
            "t_band_ms": round(t_band, 2),
            "ici_gbps": args.ici_gbps,
            "frame_gather_bytes": frame_bytes,
            "grad_psum_bytes": grad_bytes,
            "scene": "bench.py scene (1080p, 100k gaussians)",
        },
        "falsify": ("run bench_scaling.py on a real multi-chip slice; "
                    "compare measured iter_s ratios to pred_step_ms, and the "
                    "per-device share to metrics['row_pairs'] slices"),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
