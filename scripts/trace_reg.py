"""Capture a jax.profiler trace of the full reg-phase train step and print
the top device ops (tf.tsl xplane parse). Sums are over `--iters` steps;
async-copy spans overlap compute, so only fusion/custom-call rows are true
serialized cost.

Usage: python scripts/trace_reg.py [--iters 2] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dir", default="/tmp/regtrace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsjax.model import gaussians as gm
    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.camera import Camera
    from gsjax.train.step import LossConfig, train_step

    width, height, n = 1920, 1080, 100_000
    rng = np.random.default_rng(0)
    points = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    points[:, 2] += 5.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, aux = gm.init_from_pcd(points, colors, n, sh_degree=3,
                                   sg_degree=0,
                                   knn_dist2=np.full((n,), 1e-4, np.float32))
    adam = gm.adam_init(params)
    cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        1.0, 0.66, width, height)
    th = 0.05
    r2 = np.eye(3, dtype=np.float32)
    r2[0, 0] = r2[2, 2] = np.cos(th)
    r2[0, 2] = np.sin(th)
    r2[2, 0] = -np.sin(th)
    near = Camera.create(r2, np.asarray([0.15, 0.0, 0.0], np.float32),
                         1.0, 0.66, width, height)
    cfg = RasterConfig(pair_capacity=1 << 21, max_per_tile=1 << 11,
                       sh_degree=3, require_depth=True)
    lc = LossConfig(reg_on=True, mv_on=True)
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    gray = jnp.asarray(rng.uniform(0, 1, (height, width)).astype(np.float32))
    bg = jnp.zeros(3)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.002, sg_sharpness=0.095, sg_color=0.00064)

    def step(p, a, ad, gt, bg, gray):
        return train_step(p, a, ad, cam, gt, bg, lrs, cfg, lc,
                          near_cam=near, gray_r=gray, gray_n=gray)

    params, aux, adam, m = step(params, aux, adam, gt, bg, gray)
    jax.block_until_ready(m["loss"])
    params, aux, adam, m = step(params, aux, adam, gt, bg, gray)
    jax.block_until_ready(m["loss"])

    jax.profiler.start_trace(args.dir)
    for _ in range(args.iters):
        params, aux, adam, m = step(params, aux, adam, gt, bg, gray)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pb = sorted(glob.glob(args.dir + "/**/*.xplane.pb", recursive=True))[-1]
    xsp = xplane_pb2.XSpace()
    xsp.ParseFromString(open(pb, "rb").read())
    for plane in xsp.planes:
        if "TPU" not in plane.name:
            continue
        tot = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                tot[plane.event_metadata[ev.metadata_id].name] += \
                    ev.duration_ps / 1e9
        if sum(tot.values()) < 100:
            continue
        print(f"== {plane.name}: {sum(tot.values()):.0f} ms total "
              f"({args.iters} iters; async spans overlap)")
        for name, ms in tot.most_common(args.top):
            print(f"  {ms / args.iters:8.2f}  {name[:100]}")


if __name__ == "__main__":
    main()
