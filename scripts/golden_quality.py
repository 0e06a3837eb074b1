"""Golden-scene quality tracking: PSNR + chamfer on a deterministic scene.

The image has no DTU/MipNeRF/TnT datasets, so rounds are compared on a
synthetic golden scene instead: flattened gaussians on a unit sphere
(`gsjax.data.synth.sphere_gaussians`) rendered from a 360-degree camera ring
into a binary COLMAP dataset, trained from the (jittered) sparse points with
the full schedule (densify + PGSR regularisation), then

  - test PSNR on the held-out every-8th views (reference NVS protocol,
    scene/dataset_readers.py:219-224),
  - TSDF mesh extraction + symmetric chamfer against the analytic sphere
    (the stand-in for the DTU chamfer protocol, dtu_eval/eval.py:36-39).

Writes a JSON file (default QUALITY.json) with the metrics; the round driver
stores one per round so regressions across rounds are visible.

Usage: python scripts/golden_quality.py [--out QUALITY_r02.json]
       [--iterations 2000] [--width 256] [--height 192] [--n_images 24]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from argparse import Namespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY.json")
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--n_images", type=int, default=24)
    ap.add_argument("--n_gauss", type=int, default=1500)
    ap.add_argument("--scene", default="sphere", choices=["sphere", "blobs"],
                    help="golden scene: 'sphere' (r2/r3 baseline) or the "
                         "harder 'blobs' (two occluding spheres, textured "
                         "background shell, anisotropic gaussians)")
    ap.add_argument("--no_reg", action="store_true",
                    help="ablation: zero the geometry losses (depth-normal "
                         "+ PGSR NCC/geo) — the chamfer delta vs the "
                         "regularised run is the GGGS thesis test")
    ap.add_argument("--reset_interval", type=int, default=0,
                    help="opacity reset interval (0 = no resets, the r3 "
                         "behaviour; the full-schedule config uses "
                         "iterations//3 for >=2 cycles)")
    ap.add_argument("--sh_degree", type=int, default=2)
    ap.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    ap.add_argument("--tetra", action="store_true",
                    help="also extract the marching-tetrahedra mesh and "
                         "gate ITS chamfer (mesh_extract_tetrahedra path)")
    ap.add_argument("--sg_degree", type=int, default=0,
                    help="spherical-gaussian lobes (unlocked at iter 100 "
                         "like the reference) — use for the full-pipeline "
                         "config")
    ap.add_argument("--appearance", default="no",
                    choices=["no", "gs", "pgsr", "gof"])
    ap.add_argument("--scene_dir", default="",
                    help="reuse/keep the generated scene here")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. cpu) — the axon jaxlib "
                         "ignores JAX_PLATFORMS, so this goes through "
                         "jax.config like tests/conftest.py")
    ap.add_argument("--no_resume", action="store_true",
                    help="ignore an existing golden_ckpt.npz and restart")
    ap.add_argument("--cluster_to_keep", type=int, default=0,
                    help="connected components kept by mesh post-processing "
                         "(0 = auto: 1 for the single-object sphere, 3 for "
                         "blobs — background shell + two foreground spheres; "
                         "keeping only the LARGEST component on a multi-"
                         "object scene deletes the other objects, which is "
                         "what capped the r4 blobs chamfer)")
    ap.add_argument("--mesh_min_opacity", type=float, default=0.0,
                    help="pre-meshing gaussian cull: drop gaussians with "
                         "filtered opacity below this from TSDF depth "
                         "rendering and tetra point generation (floater "
                         "suppression)")
    ap.add_argument("--presize_pairs", type=int, default=0,
                    help="pre-size the pair buckets (pair capacity; live "
                         "capacity = half) so capacity-bump recompiles "
                         "(minutes each on TPU) never hit mid-run")
    ap.add_argument("--schedule_iters", type=int, default=0,
                    help="pin the schedule horizon (lr decay, reg start, "
                         "densify window) to this iteration count while "
                         "training to --iterations. Use when EXTENDING a "
                         "checkpointed run: without it a larger "
                         "--iterations rescales the whole schedule "
                         "mid-trajectory (measured to HURT: the r5 sphere "
                         "+700-iter extension dropped PSNR 32.9 -> 29.9)")
    args = ap.parse_args()
    n_cluster = args.cluster_to_keep or {"sphere": 1, "blobs": 3}[args.scene]

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import pickle
    import random

    from gsjax.config import OptimizationParams
    from gsjax.data.readers import build_nearest_view_graph, load_scene
    from gsjax.data.synth import (blobs_gaussians, blobs_surface_distance,
                                  blobs_surface_samples, ring_pose,
                                  sphere_gaussians, write_rendered_colmap)
    from gsjax.mesh.extract import extract_mesh_tsdf
    from gsjax.model import appearance as app_lib
    from gsjax.model.io import load_checkpoint, save_checkpoint
    from gsjax.train.loop import Trainer
    from gsjax.train.losses import psnr

    t_start = time.time()
    root = args.scene_dir or os.path.join(
        tempfile.gettempdir(),
        f"gsjax_golden_scene_{args.scene}_{args.width}x{args.height}"
        f"_n{args.n_images}_g{args.n_gauss}")
    if not os.path.exists(os.path.join(root, "sparse")):
        print(f"generating golden scene at {root}", flush=True)
        gen = {"sphere": sphere_gaussians, "blobs": blobs_gaussians}
        ring = ring_pose if args.scene == "sphere" else             (lambda i, n: ring_pose(i, n, radius=4.2, height_amp=1.1,
                                    target=(0.7, 0.1, 0.25)))
        write_rendered_colmap(
            root, n_images=args.n_images, width=args.width,
            height=args.height, gaussians=gen[args.scene](args.n_gauss),
            pose_fn=ring, points_noise=0.03,
            pair_capacity=1 << 18, max_per_tile=1 << 10)

    scene = load_scene(root, "images", None, eval_split=True)
    build_nearest_view_graph(scene.train_views, 30, 0.01, 1.5, 8)

    o = Namespace(**OptimizationParams._defaults())
    sched = args.schedule_iters or args.iterations
    o.iterations = args.iterations
    o.densify_from_iter = 300
    o.densify_until_iter = int(sched * 0.75)
    o.densification_interval = 100
    o.densify_grad_threshold = args.densify_grad_threshold
    o.opacity_reset_interval = args.reset_interval or 100_000
    o.regularization_from_iter = sched // 2
    o.position_lr_max_steps = sched
    if args.no_reg:
        o.lambda_depth_normal = 0.0
        o.lambda_multi_view_geo = 0.0
        o.lambda_multi_view_ncc = 0.0

    # keyed by scene config so a smoke run and the real run never share a
    # checkpoint
    model_path = os.path.join(
        tempfile.gettempdir(),
        f"gsjax_golden_out_{args.width}x{args.height}"
        f"_n{args.n_images}_g{args.n_gauss}_i{args.iterations}"
        f"_sg{args.sg_degree}_{args.appearance}_{args.scene}"
        f"{'_noreg' if args.no_reg else ''}"
        f"{'_rst' + str(args.reset_interval) if args.reset_interval else ''}"
        f"{'_sh' + str(args.sh_degree) if args.sh_degree != 2 else ''}")
    os.makedirs(model_path, exist_ok=True)
    trainer = Trainer.create(scene, o, model_path, sh_degree=args.sh_degree,
                             sg_degree=args.sg_degree,
                             appearance=args.appearance)
    if args.presize_pairs:
        from gsjax.train.loop import next_pow2
        trainer.pair_capacity = max(trainer.pair_capacity,
                                    next_pow2(args.presize_pairs))
        trainer.live_capacity = max(trainer.live_capacity,
                                    trainer.pair_capacity // 2)

    # Periodic checkpoint + resume so the long (hours-on-CPU) run survives
    # process restarts. RNG state rides in the checkpoint's `extra` dict
    # (unknown keys are ignored by the appearance restore), making the
    # resumed trajectory identical to an uninterrupted run.
    ckpt_path = os.path.join(model_path, "golden_ckpt.npz")

    def save_golden_ckpt():
        extra = app_lib.state_to_arrays(trainer.app)
        extra["rng_pystate"] = np.frombuffer(
            pickle.dumps(random.getstate()), np.uint8)
        extra["rng_key"] = np.asarray(trainer.key)
        save_checkpoint(ckpt_path + ".tmp.npz", trainer.params, trainer.aux,
                        trainer.adam, trainer.iteration, extra)
        os.replace(ckpt_path + ".tmp.npz", ckpt_path)

    if not args.no_resume and os.path.exists(ckpt_path):
        p, a, ad, it, extra = load_checkpoint(ckpt_path)
        trainer.params, trainer.aux, trainer.adam, trainer.iteration = p, a, ad, it
        trainer.app = app_lib.state_from_arrays(trainer.app, extra)
        if "rng_pystate" in extra:
            random.setstate(pickle.loads(extra["rng_pystate"].tobytes()))
        if "rng_key" in extra:
            trainer.key = jnp.asarray(extra["rng_key"])
        print(f"resumed from {ckpt_path} at iteration {it}", flush=True)

    log_every = max(args.iterations // 10, 1)
    loop_s = 0.0          # pure training-loop wall (excl. ckpt/log IO)
    loop_iters = 0
    while trainer.iteration < o.iterations:
        t_it = time.perf_counter()
        metrics = trainer.step()
        loop_s += time.perf_counter() - t_it
        loop_iters += 1
        if trainer.iteration % log_every == 0:
            print(f"it {trainer.iteration}: loss={float(metrics['loss']):.4f} "
                  f"n={int(np.sum(np.asarray(trainer.aux.alive)))} "
                  f"({time.time() - t_start:.0f}s, "
                  f"{loop_iters / max(loop_s, 1e-9):.2f} it/s)", flush=True)
            save_golden_ckpt()

    # --- loop-level iters/s: measured loop wall vs pure device step ---------
    # (the r4 verdict: "train iters/s has no loop-level measurement"). The
    # device-step time re-runs the settled jitted step on the final state;
    # the difference to the measured loop mean is host-side glue (gt staging,
    # capacity bookkeeping, densify surgery, checkpoint scheduling).
    step_ms_device = None
    if loop_iters > 0:
        import jax as _jax

        from gsjax.train.step import LossConfig as _LC
        from gsjax.train.step import train_step as _ts
        v0 = scene.train_views[0]
        near0 = scene.train_views[v0.nearest_ids[0]] if v0.nearest_ids else None
        _cfg = trainer.raster_cfg(require_depth=True)
        _mvcap = trainer.mv_query_capacity or None
        _lc = _LC(reg_on=True, mv_on=near0 is not None,
                  mv_query_capacity=_mvcap)
        _common = dict(
            near_cam=near0.camera if near0 is not None else None,
            gray_r=jnp.asarray(v0.gray) if near0 is not None else None,
            gray_n=jnp.asarray(near0.gray) if near0 is not None else None)
        _gt = trainer.gt_for(v0)
        _, _, _, m0 = _ts(trainer.params, trainer.aux, trainer.adam,
                          v0.camera, _gt, trainer.bg(), trainer.lrs(), _cfg,
                          _lc, **_common)
        float(m0["loss"])    # compile + fence
        t0 = time.perf_counter()
        for _ in range(5):
            _, _, _, m0 = _ts(trainer.params, trainer.aux, trainer.adam,
                              v0.camera, _gt, trainer.bg(), trainer.lrs(),
                              _cfg, _lc, **_common)
        float(m0["loss"])
        step_ms_device = (time.perf_counter() - t0) / 5 * 1e3
        print(f"loop {loop_iters / max(loop_s, 1e-9):.2f} it/s measured; "
              f"device step {step_ms_device:.0f} ms "
              f"(host glue {loop_s / loop_iters * 1e3 - step_ms_device:.0f}"
              f" ms/iter)", flush=True)

    # --- NVS: PSNR over the held-out views ----------------------------------
    vals = []
    for v in scene.test_views:
        out = trainer.render_view(v, require_depth=True)
        vals.append(float(psnr(jnp.clip(out["render"], 0, 1),
                               trainer.gt_for(v))))
    test_psnr = float(np.mean(vals)) if vals else float("nan")
    print(f"test PSNR over {len(vals)} held-out views: {test_psnr:.2f} dB",
          flush=True)

    # --- geometry: mesh vs the analytic surface ----------------------------
    from scipy.spatial import cKDTree

    if args.scene == "sphere":
        def surf_dist(verts):
            return np.abs(np.linalg.norm(verts, axis=1) - 1.0)

        srng = np.random.default_rng(0)
        samples = srng.normal(0, 1, (20000, 3))
        samples /= np.linalg.norm(samples, axis=1, keepdims=True)
        crop_r = 2.0
    else:
        surf_dist = blobs_surface_distance
        samples = blobs_surface_samples()
        crop_r = 2.5

    def chamfer_of(verts, label):
        # crop the background shell / fliers before evaluation (the DTU
        # protocol's ObsMask analogue for the synthetic scenes)
        verts = np.asarray(verts)
        verts = verts[np.linalg.norm(verts, axis=1) <= crop_r] \
            if len(verts) else verts
        if len(verts) == 0:
            return float("inf"), float("inf"), float("inf"), 0
        d2s = float(np.mean(surf_dist(verts)))
        s2d = float(np.mean(cKDTree(verts).query(samples, k=1)[0]))
        ch = 0.5 * (d2s + s2d)
        print(f"{label}: {len(verts)} verts (cropped); chamfer={ch:.4f} "
              f"(d2s={d2s:.4f}, s2d={s2d:.4f})", flush=True)
        return ch, d2s, s2d, len(verts)

    mesh = extract_mesh_tsdf(
        lambda v: trainer.render_view(v, require_depth=True,
                                      min_opacity=args.mesh_min_opacity),
        scene.train_views, voxel_size=0.02, depth_trunc=6.0,
        cluster_to_keep=n_cluster)
    verts, faces = mesh["post"]
    if len(verts) == 0:
        verts, faces = mesh["raw"]
    chamfer, d2s, s2d, nverts = chamfer_of(verts, "tsdf mesh")

    chamfer_tetra = None
    if args.tetra:
        from gsjax.mesh.extract import extract_mesh_tetrahedra
        tmesh = extract_mesh_tetrahedra(
            trainer.params, trainer.aux, scene.train_views,
            trainer.raster_cfg(require_depth=True), n_binary_steps=8,
            cluster_to_keep=n_cluster,
            min_opacity=args.mesh_min_opacity)
        tverts, _ = tmesh["post"]
        if len(tverts) == 0:
            tverts, _ = tmesh["raw"]
        chamfer_tetra = chamfer_of(tverts, "tetra mesh")[0]

    result = {
        "scene": f"{args.scene}_ring",
        "platform": jax.default_backend(),
        "iterations": args.iterations,
        "sg_degree": args.sg_degree,
        "appearance": args.appearance,
        "n_train_views": len(scene.train_views),
        "n_test_views": len(scene.test_views),
        "n_gaussians_final": int(np.sum(np.asarray(trainer.aux.alive))),
        "test_psnr_db": round(test_psnr, 3),
        "chamfer": round(chamfer, 5),
        "chamfer_d2s": round(d2s, 5),
        "chamfer_s2d": round(s2d, 5),
        "chamfer_tetra": (round(chamfer_tetra, 5)
                          if chamfer_tetra is not None
                          and np.isfinite(chamfer_tetra) else None),
        "mesh_vertices": int(nverts),
        "no_reg": bool(args.no_reg),
        "reset_interval": args.reset_interval,
        "sh_degree": args.sh_degree,
        "cluster_to_keep": n_cluster,
        "mesh_min_opacity": args.mesh_min_opacity,
        "wall_s": round(time.time() - t_start, 1),
        # loop-level throughput (this process; excludes ckpt/log IO) and the
        # pure device-step time on the final state — their difference is the
        # host-side glue per iteration
        "loop_iters_per_s": (round(loop_iters / loop_s, 3)
                             if loop_iters else None),
        "loop_mean_ms": (round(loop_s / loop_iters * 1e3, 1)
                         if loop_iters else None),
        "step_ms_device": (round(step_ms_device, 1)
                           if step_ms_device is not None else None),
    }
    # Pass thresholds — regression-tight at just-above-achieved (r4 verdict
    # item 7: a gate with 20% headroom would pass a 20% regression).
    #   sphere: r3/r4-calibrated (r4: 36.75 dB / chamfer 0.0184 at 3k iters,
    #     floored near the 0.02 TSDF voxel).
    #   blobs: r5 run (25.0 dB / 0.328 TSDF / 0.185 tetra at 2.4k iters,
    #     cluster_to_keep=3). The TSDF bar stays loose on purpose: ckpt
    #     analysis (AB_r05.json) showed the d2s junk is OPAQUE free-space
    #     geometry the short schedule never prunes — extraction-time levers
    #     (opacity cull, min-weight) are measured-falsified; the tetra
    #     route's alpha-cull pipeline is the geometry bar that binds.
    # Ablation runs (--no_reg) report metrics but only gate PSNR (their
    # chamfer is the comparison POINT, not a target).
    thr = {"sphere": (34.0, 0.025, 0.0625),
           "blobs": (23.0, 0.34, 0.22)}[args.scene]
    result["thresholds"] = {"test_psnr_db_min": thr[0],
                            "chamfer_max": thr[1],
                            "chamfer_tetra_max": thr[2]}
    ch_ok = True if args.no_reg else (
        chamfer <= thr[1] and
        (chamfer_tetra is None or chamfer_tetra <= thr[2]))
    result["pass"] = bool(test_psnr >= thr[0] and ch_ok)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
