"""Round-5 reg-step decomposition: where do the 555 ms go, and what does the
mv_query_capacity bucket actually buy?

Times, on the bench_reg workload (1080p, 100k gaussians):
  - full train_step at mv_query_capacity in {None (dense), 2^20, 2^16}
  - sample_depth fwd+bwd alone at Q in {2^21 (dense-ish), 2^20, 2^16}
  - render-only step (reg_on but mv off) for the non-mv remainder

Usage: python scripts/profile_mv_r5.py [--out /tmp/mv_r5.json]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsjax.model import gaussians as gm
    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.sample import sample_depth
    from gsjax.train.step import LossConfig, train_step
    from gsjax.utils.benchsync import sync

    width, height, n = 1920, 1080, 100_000
    rng = np.random.default_rng(0)
    points = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    points[:, 2] += 5.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, aux = gm.init_from_pcd(points, colors, n, sh_degree=3, sg_degree=0,
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
    cfg = RasterConfig(pair_capacity=1 << 21, live_capacity=1 << 20,
                       max_per_tile=1 << 11, sh_degree=3, require_depth=True)
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    gray = jnp.asarray(rng.uniform(0, 1, (height, width)).astype(np.float32))
    bg = jnp.zeros(3)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.002, sg_sharpness=0.095, sg_color=0.00064)

    out = {}

    def timeit(label, fn):
        r = fn()
        sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn()
        sync(jax.tree_util.tree_leaves(r)[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        out[label] = round(ms, 1)
        print(f"{label}: {ms:.1f} ms", flush=True)

    def step_fn(lc):
        def f():
            _, _, _, m = train_step(params, aux, adam, cam, gt, bg, lrs, cfg,
                                    lc, near_cam=near, gray_r=gray,
                                    gray_n=gray)
            return m["loss"]
        return f

    timeit("step reg+mv dense", step_fn(
        LossConfig(reg_on=True, mv_on=True, mv_query_capacity=None)))
    timeit("step reg+mv cap 2^20", step_fn(
        LossConfig(reg_on=True, mv_on=True, mv_query_capacity=1 << 20)))
    timeit("step reg+mv cap 2^16", step_fn(
        LossConfig(reg_on=True, mv_on=True, mv_query_capacity=1 << 16)))
    timeit("step reg only (no mv)", step_fn(
        LossConfig(reg_on=True, mv_on=False)))

    # sample_depth alone
    scales, opac = gm.scaling_n_opacity_with_3d_filter(params, aux.filter_3d)
    for qlog in (21, 20, 16):
        q = 1 << qlog
        qp = rng.normal(0, 1.2, (q, 3)).astype(np.float32)
        qp[:, 2] += 5.0
        qp = jnp.asarray(qp)

        def f(qp=qp):
            def loss(qp_):
                r = sample_depth(qp_, params.xyz, scales, params.rotation,
                                 opac, near, cfg, aux.alive)
                return jnp.sum(jnp.where(r["inside"], r["sampled_depth"], 0.0))
            return jax.grad(loss)(qp)
        timeit(f"sample_depth fwd+bwd Q=2^{qlog}", f)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
