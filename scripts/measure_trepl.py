"""Measure the replicated residue of the sharded step on the real TPU.

The scaling model's t_repl term (Adam update + densification-stat taps,
which stay replicated across devices) was a 2.0 ms GUESS in rounds 3-4 —
at 16 devices that guess is ~10% of the predicted step, so it decides
whether the 16-device efficiency clears 0.78. This times the actual ops at
the bench capacity and prints a JSON line for scaling_model --t_repl_ms.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gsjax.utils.devprobe import wait_for_device
    if not wait_for_device(log=lambda m: print(m, file=sys.stderr)):
        sys.exit(3)
    import jax
    import jax.numpy as jnp

    from gsjax.model import gaussians as gm
    from gsjax.utils.benchsync import sync

    n = 100_000
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, aux = gm.init_from_pcd(pts, cols, n, sh_degree=3, sg_degree=0,
                                   knn_dist2=np.full((n,), 1e-4, np.float32))
    adam = gm.adam_init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-6, params)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.002, sg_sharpness=0.095, sg_color=0.00064)
    g2d = jnp.zeros((n, 2))
    vis = jnp.ones((n,), bool)
    radii = jnp.ones((n,), jnp.int32)

    @jax.jit
    def repl(params, adam, aux, grads, g2d, vis, radii):
        import dataclasses
        aux = gm.add_densification_stats(aux, g2d, vis, 1920, 1080)
        aux = dataclasses.replace(
            aux, max_radii=jnp.maximum(aux.max_radii,
                                       jnp.where(vis, radii, 0)))
        p2, a2 = gm.adam_update(params, grads, adam, lrs)
        return p2, a2, aux

    out = repl(params, adam, aux, grads, g2d, vis, radii)
    sync(out[0].xyz)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = repl(params, adam, aux, grads, g2d, vis, radii)
    sync(out[0].xyz)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"metric": "t_repl_ms", "value": round(ms, 3),
                      "capacity": n}))


if __name__ == "__main__":
    main()
