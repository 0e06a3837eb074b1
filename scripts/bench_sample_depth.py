"""Benchmark sample_depth (PGSR geometric-loss hot path) at realistic scale.

Reference counterpart: sampleDepthCUDA (sample_forward.cu:430-700) — a second
full binning+march per train iteration once regularization kicks in.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("GSJAX_RASTER_BACKEND", "pallas")
# point-query backend: "pallas" = hand-written kernels, "ref" = XLA rounds
os.environ.setdefault("GSJAX_SAMPLE_BACKEND", "pallas")


def main():
    import jax
    import jax.numpy as jnp

    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.raster.config import RasterConfig
    from gsjax.ops.sample import sample_depth

    w = int(os.environ.get("BW", 800))
    h = int(os.environ.get("BH", 600))
    n = int(os.environ.get("BN", 200_000))
    q = h * w

    rng = np.random.default_rng(0)
    means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    means[:, 2] += 5.0
    scales = np.exp(rng.normal(-3.3, 0.3, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(0.0, 1.0, n)))).astype(np.float32)

    cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        1.0, 0.66, w, h)
    cfg = RasterConfig(pair_capacity=1 << 21, max_per_tile=1 << 11)

    # dense backprojected grid of query points, like patchmatch
    xs = (np.arange(w) - w / 2) / (0.5 * w / np.tan(0.5))
    ys = (np.arange(h) - h / 2) / (0.5 * w / np.tan(0.5))
    depth = rng.uniform(3.0, 7.0, (h, w)).astype(np.float32)
    pts = np.stack([depth * xs[None, :], depth * ys[:, None], depth],
                   axis=-1).reshape(-1, 3).astype(np.float32)

    args = tuple(map(jnp.asarray, (pts, means, scales, quats, opac)))

    fwd = jax.jit(lambda p, m, s, qq, o: sample_depth(
        p, m, s, qq, o, cam, cfg)["sampled_depth"])

    def loss(p, m, s, qq, o):
        r = sample_depth(p, m, s, qq, o, cam, cfg)
        return jnp.sum(jnp.where(r["inside"], r["sampled_depth"], 0.0))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    # block_until_ready is a NO-OP on the axon relay (resolves at
    # enqueue; observed 2026-08-18): fence with a host scalar fetch
    def _sync(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]

    t0 = time.perf_counter()
    out = fwd(*args)
    _sync(out)
    print(f"fwd compile+run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = fwd(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"fwd: {dt*1e3:.1f} ms  ({q/dt/1e6:.2f} Mpts/s)")

    if os.environ.get("BGRAD", "1") == "1":
        t0 = time.perf_counter()
        g = grad(*args)
        _sync(g)
        print(f"grad compile+run: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(iters):
            g = grad(*args)
        _sync(g)
        dt = (time.perf_counter() - t0) / iters
        print(f"fwd+bwd: {dt*1e3:.1f} ms  ({q/dt/1e6:.2f} Mpts/s)")


if __name__ == "__main__":
    main()
