"""Blobs floater A/B: TSDF mesh quality vs the pre-meshing gaussian
opacity cull and the TSDF min-weight threshold, from a trained golden ckpt.

Renders depth maps per opacity-cull setting (TPU), then fuses/meshes/
cluster-filters per (min_weight, cluster_to_keep) on the host — so one run
measures the full grid. Writes /tmp/blobs_mesh_ab.json and prints rows.

Usage: python scripts/blobs_mesh_ab.py --model_dir /tmp/gsjax_golden_out_...
       [--scene_dir /tmp/gsjax_golden_scene_blobs_...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from argparse import Namespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--out", default="/tmp/blobs_mesh_ab.json")
    ap.add_argument("--opacities", default="0.0,0.1,0.3")
    ap.add_argument("--min_weights", default="1,2,3")
    ap.add_argument("--clusters", default="3,6")
    args = ap.parse_args()

    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from gsjax.config import OptimizationParams
    from gsjax.data.readers import build_nearest_view_graph, load_scene
    from gsjax.data.synth import blobs_surface_distance, blobs_surface_samples
    from gsjax.mesh.cluster import post_process_mesh
    from gsjax.mesh.extract import fuse_tsdf, tsdf_to_mesh
    from gsjax.model import appearance as app_lib
    from gsjax.model.io import load_checkpoint
    from gsjax.train.loop import Trainer

    scene = load_scene(args.scene_dir, "images", None, eval_split=True)
    build_nearest_view_graph(scene.train_views, 30, 0.01, 1.5, 8)
    o = Namespace(**OptimizationParams._defaults())
    tr = Trainer(scene=scene, params=None, aux=None, adam=None,
                 app=app_lib.init_appearance("no", 1, 0), opt=o,
                 model_path="/tmp/mesh_ab")
    p, a, ad, it, extra = load_checkpoint(
        os.path.join(args.model_dir, "golden_ckpt.npz"))
    tr.params, tr.aux, tr.adam, tr.iteration = p, a, ad, it
    tr.pair_capacity = 1 << 19
    tr.live_capacity = 1 << 18
    tr.max_per_tile = 1 << 11
    tr.active_sh = 3
    tr.active_sg = int(np.asarray(p.sg_color).shape[1]) \
        if p.sg_color.ndim == 3 else 0
    print(f"loaded ckpt at iter {it}, "
          f"{int(np.sum(np.asarray(a.alive)))} gaussians", flush=True)

    samples = blobs_surface_samples()

    def chamfer_of(verts):
        verts = np.asarray(verts)
        verts = verts[np.linalg.norm(verts, axis=1) <= 2.5] \
            if len(verts) else verts
        if len(verts) == 0:
            return dict(chamfer=None, d2s=None, s2d=None, nverts=0)
        d2s = float(np.mean(blobs_surface_distance(verts)))
        s2d = float(np.mean(cKDTree(verts).query(samples, k=1)[0]))
        return dict(chamfer=round(0.5 * (d2s + s2d), 4), d2s=round(d2s, 4),
                    s2d=round(s2d, 4), nverts=int(len(verts)))

    rows = []
    for mo in [float(x) for x in args.opacities.split(",")]:
        depths, colors = [], []
        for i, v in enumerate(scene.train_views):
            out = tr.render_view(v, require_depth=True, min_opacity=mo)
            depths.append(np.asarray(out["median_depth"]))
            colors.append(np.clip(np.asarray(out["render"]), 0, 1))
        print(f"rendered {len(depths)} depth maps at min_opacity={mo}",
              flush=True)
        tsdf, weight, _c, origin, vs = fuse_tsdf(
            depths, colors, scene.train_views, 0.02, 6.0, verbose=False)
        for mw in [float(x) for x in args.min_weights.split(",")]:
            verts, faces = tsdf_to_mesh(tsdf, weight, origin, vs,
                                        min_weight=mw)
            for nc in [int(x) for x in args.clusters.split(",")]:
                pv, pf = post_process_mesh(verts, faces, nc)
                row = dict(min_opacity=mo, min_weight=mw, clusters=nc,
                           **chamfer_of(pv))
                rows.append(row)
                print(row, flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
