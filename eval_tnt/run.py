"""TnT F1 evaluation CLI. Mirrors the reference eval_tnt/run.py:59-200 flag
surface, delegating to gsjax.eval.tnt."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    from gsjax.data.ply import read_ply  # noqa: E402
    from gsjax.eval.tnt import run_tnt_evaluation  # noqa: E402

    parser = ArgumentParser()
    parser.add_argument("--dataset-dir", required=True)
    parser.add_argument("--traj-path", required=True)
    parser.add_argument("--ply-path", required=True)
    parser.add_argument("--out-dir", default=None)
    args = parser.parse_args()

    scene = os.path.basename(os.path.normpath(args.dataset_dir))
    v = read_ply(args.ply_path)
    verts = np.stack([v["x"], v["y"], v["z"]], 1)
    faces = v.get("__faces__", np.zeros((0, 3), np.int64))
    res = run_tnt_evaluation(verts, faces, args.dataset_dir, scene,
                             args.traj_path,
                             args.out_dir or os.path.dirname(args.ply_path))
    print(f"precision {res['precision']:.4f} recall {res['recall']:.4f} "
          f"f1 {res['f1']:.4f} @ tau {res['tau']}")


if __name__ == "__main__":
    main()
