"""Round-4 quality gate: three golden runs + the reg-ablation differential.

  A. sphere, FULL schedule: 3000 iters, opacity resets every 900 (>=2 full
     cycles), SH degree 3 + SG lobes, aggressive densify (grad th 1e-4),
     PGSR reg from iter 1500, TSDF AND tetra meshes gated on chamfer.
  B. the SAME config with --no_reg: the chamfer delta A vs B is the GGGS
     thesis test (geometry losses must measurably improve geometry).
  C. the harder 'blobs' scene (occluding spheres, textured background
     shell, anisotropic gaussians) with the same schedule, 2400 iters.

Each sub-run checkpoints/resumes (golden_quality.py), so an interrupted
sweep continues. Results merge into QUALITY_r04.json with per-run pass
flags plus the ablation delta.

Usage: python scripts/quality_r04.py [--out QUALITY_r04.json]
       [--width 320 --height 240]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args_list, out):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "golden_quality.py"),
           "--out", out] + args_list
    print("RUN:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd, cwd=REPO)
    if rc != 0:
        print(f"WARNING: sub-run exited rc={rc}", flush=True)
    if os.path.exists(out):
        with open(out) as f:
            return json.load(f)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QUALITY_r04.json")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--iters_main", type=int, default=3000)
    ap.add_argument("--iters_blobs", type=int, default=2400)
    args = ap.parse_args()

    wh = ["--width", str(args.width), "--height", str(args.height)]
    sched = ["--sh_degree", "3", "--sg_degree", "2",
             "--densify_grad_threshold", "1e-4", "--n_images", "28"]

    main_cfg = ["--scene", "sphere", "--iterations", str(args.iters_main),
                "--reset_interval", str(args.iters_main // 3 - 100),
                "--n_gauss", "2000", "--tetra"] + wh + sched
    a = run(main_cfg, "QUALITY_r04_main.json")
    b = run(main_cfg + ["--no_reg"], "QUALITY_r04_noreg.json")
    c = run(["--scene", "blobs", "--iterations", str(args.iters_blobs),
             "--reset_interval", str(args.iters_blobs // 3 - 100),
             "--n_gauss", "2600", "--tetra"] + wh + sched,
            "QUALITY_r04_blobs.json")

    delta = None
    if a and b and a.get("chamfer") and b.get("chamfer"):
        delta = round(b["chamfer"] - a["chamfer"], 5)
    merged = {
        "main_sphere_full_schedule": a,
        "ablation_no_reg": b,
        "blobs_hard_scene": c,
        # GGGS thesis: regularisation must IMPROVE geometry — the no-reg
        # chamfer must be strictly worse than the regularised run's
        "reg_chamfer_improvement": delta,
        "pass": bool(a and a.get("pass") and c and c.get("pass")
                     and delta is not None and delta > 0),
    }
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged, indent=1), flush=True)


if __name__ == "__main__":
    main()
