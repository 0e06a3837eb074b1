"""Timing of the Pallas fwd / fwd+bwd render vs the XLA ref path on TPU."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops.raster import RasterConfig, render
from gsjax.ops.raster.camera import Camera

width = int(os.environ.get("W", 1920))
height = int(os.environ.get("H", 1080))
n = int(os.environ.get("N", 100_000))
iters = int(os.environ.get("ITERS", 10))
run_ref = os.environ.get("REF", "0") == "1"

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
base = RasterConfig(pair_capacity=1 << 21, max_per_tile=1 << 12, sh_degree=3,
                    require_depth=os.environ.get("DEPTH", "1") == "1")
args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
bg = jnp.zeros(3)
gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))


def _sync(o):
    # block_until_ready is a NO-OP on the axon relay (resolves at enqueue;
    # observed 2026-08-18): fence with a host scalar fetch instead
    return np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]


def time_fn(f, *a, label=""):
    t0 = time.perf_counter()
    out = f(*a)
    _sync(out)
    print(f"{label} compile+1st: {time.perf_counter()-t0:.2f}s")
    _sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms/it = {width*height/dt/1e6:.2f} Mrays/s")
    return out


backends = ("pallas", "ref") if run_ref else ("pallas",)
for backend in backends:
    cfg = dataclasses.replace(base, backend=backend)

    @jax.jit
    def fwd(means, scales, quats, opac, shs):
        return render(means, scales, quats, opac, shs, cam, cfg, bg)["render"]

    def fwd_bwd(means, scales, quats, opac, shs, _cfg=cfg):
        def loss_fn(*a):
            out = render(*a, cam, _cfg, bg)
            l = jnp.abs(out["render"] - gt).mean()
            if _cfg.require_depth:
                l += 1e-3 * out["median_depth"].mean() + \
                    1e-3 * out["normal"].mean() + 1e-3 * out["alpha"].mean()
            return l
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            means, scales, quats, opac, shs)

    fwd_bwd = jax.jit(fwd_bwd)
    time_fn(fwd, *args, label=f"{backend} fwd    ")
    time_fn(fwd_bwd, *args, label=f"{backend} fwd+bwd")
