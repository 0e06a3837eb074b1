"""Replay a NaN-probe snapshot under jax_debug_nans to find the faulting op.

`GSJAX_NAN_PROBE=1` training (gsjax/train/loop.py) dumps the PRE-step model
state the first time an alive gaussian's grad/param goes non-finite. This
tool reloads that state, rebuilds the same scene/view pair, and re-runs the
exact train_step on CPU with `jax_debug_nans` enabled — JAX then raises at
the first primitive that PRODUCES a NaN, with a Python stack trace into
gsjax/ops/..., which is the root cause location.

Usage:
  python scripts/nan_hunt.py SNAPSHOT.npz --scene_dir /tmp/gsjax_golden_...
      [--iterations N --reset_interval R ...]   (the golden run's schedule)
"""

from __future__ import annotations

import argparse
import os
import sys
from argparse import Namespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshot")
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--no_debug_nans", action="store_true",
                    help="just re-run and print per-field non-finite counts "
                         "(faster; use before the debug_nans replay)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)
    if not args.no_debug_nans:
        jax.config.update("jax_debug_nans", True)
    import dataclasses

    import jax.numpy as jnp

    from gsjax.config import OptimizationParams
    from gsjax.data.readers import build_nearest_view_graph, load_scene
    from gsjax.model import gaussians as gm
    from gsjax.train.loop import Trainer
    from gsjax.train.step import LossConfig, train_step

    z = np.load(args.snapshot)
    it = int(z["iteration"])
    print(f"snapshot: iteration {it}, view uid {int(z['view_uid'])}, "
          f"near uid {int(z['near_uid'])}")

    def tree_of(cls, prefix):
        kw = {f.name: jnp.asarray(z[f"{prefix}.{f.name}"])
              for f in dataclasses.fields(cls)}
        return cls(**kw)

    params = tree_of(gm.GaussianParams, "params")
    aux = tree_of(gm.GaussianAux, "aux")
    adam = gm.AdamState(mu=tree_of(gm.GaussianParams, "adam_mu"),
                        nu=tree_of(gm.GaussianParams, "adam_nu"),
                        count=jnp.asarray(z["adam.count"]))

    scene = load_scene(args.scene_dir, "images", None, eval_split=True)
    build_nearest_view_graph(scene.train_views, 30, 0.01, 1.5, 8)
    view = scene.train_views[int(z["view_uid"])]
    near = None if int(z["near_uid"]) < 0 else \
        scene.train_views[int(z["near_uid"])]

    o = Namespace(**OptimizationParams._defaults())
    tr = Trainer(scene=scene, params=params, aux=aux, adam=adam, app=None,
                 opt=o, model_path="/tmp/nan_hunt")
    tr.iteration = it
    tr.active_sh = int(z["active_sh"])
    tr.active_sg = int(z["active_sg"])
    cap = params.capacity
    tr.pair_capacity = 1 << 19
    tr.live_capacity = 1 << 18
    tr.max_per_tile = 1 << 11
    cfg = tr.raster_cfg(require_depth=True)
    lcfg = LossConfig(reg_on=True, mv_on=near is not None, nan_stats=True)
    lrs = tr.lrs()

    common = {}
    if near is not None:
        common = dict(near_cam=near.camera,
                      gray_r=jnp.asarray(view.gray),
                      gray_n=jnp.asarray(near.gray))
    print(f"replaying step (capacity {cap}, platform {args.platform}, "
          f"debug_nans={not args.no_debug_nans})...", flush=True)
    p2, a2, ad2, m = train_step(params, aux, adam, view.camera,
                                jnp.asarray(view.image), jnp.zeros(3), lrs,
                                cfg, lcfg, **common)
    nf = {f"{k}.{f}": int(v) for k, d in m["nonfinite"].items()
          for f, v in d.items()}
    print("replay non-finite counts:", {k: v for k, v in nf.items() if v})
    print("loss:", float(m["loss"]))


if __name__ == "__main__":
    main()
