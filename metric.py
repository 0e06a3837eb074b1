"""NVS metric CLI: PSNR / SSIM / LPIPS over rendered image trees.

Mirrors the reference `metric.py:36-102`: reads
<model>/{test,train}/ours_<iter>/{renders,gt}, writes results.json +
per_view.json. LPIPS requires weights (see gsjax/eval/lpips.py); reported as
null when unavailable."""

import json
import os
from argparse import ArgumentParser

import numpy as np


def read_dir(path):
    from PIL import Image

    names = sorted(os.listdir(path))
    return names, [np.asarray(Image.open(os.path.join(path, n)),
                              dtype=np.float32) / 255.0 for n in names]


def main():
    # metrics are tiny per-image reductions: run on CPU so the CLI never
    # contends for the TPU claim (override with GSJAX_METRIC_PLATFORM)
    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("GSJAX_METRIC_PLATFORM", "cpu"))
    import jax.numpy as jnp

    from gsjax.eval import lpips as lpips_mod
    from gsjax.train import losses

    parser = ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = parser.parse_args()

    lp_weights = lpips_mod.load_weights()
    if lp_weights is None:
        print("WARNING: LPIPS weights not found -> reporting lpips: null.\n"
              "  Pretrained VGG16 weights cannot be downloaded in this "
              "offline image.\n"
              "  On any machine with the `lpips` pip package, run:\n"
              "    python -m gsjax.eval.lpips lpips_vgg.npz\n"
              "  then re-run with GSJAX_LPIPS_WEIGHTS=lpips_vgg.npz.",
              flush=True)
    for model_path in args.model_paths:
        print("Scene:", model_path)
        full = {}
        per_view = {}
        test_dir = os.path.join(model_path, "test")
        if not os.path.isdir(test_dir):
            print("  no test renders; run render.py first")
            continue
        for method in sorted(os.listdir(test_dir)):
            rdir = os.path.join(test_dir, method, "renders")
            gdir = os.path.join(test_dir, method, "gt")
            names, renders = read_dir(rdir)
            _, gts = read_dir(gdir)
            psnrs, ssims, lpipss = [], [], []
            for r, g in zip(renders, gts):
                r3, g3 = jnp.asarray(r[..., :3]), jnp.asarray(g[..., :3])
                psnrs.append(float(losses.psnr(r3, g3)))
                ssims.append(float(losses.ssim(r3, g3)))
                lp = lpips_mod.lpips(r3, g3, lp_weights) if lp_weights else None
                lpipss.append(lp)
            # LPIPS stays null (numeric consumers handle None/skip), with a
            # sibling status field carrying the human-readable reason — a
            # string in the numeric slot breaks float()/comparison consumers
            # (ADVICE r4).
            lp_status = "ok" if lp_weights else "weights unavailable"
            full[method] = {
                "PSNR": float(np.mean(psnrs)),
                "SSIM": float(np.mean(ssims)),
                "LPIPS": (float(np.mean([x for x in lpipss if x is not None]))
                          if lp_weights else None),
                "LPIPS_status": lp_status,
            }
            per_view[method] = {
                "PSNR": dict(zip(names, psnrs)),
                "SSIM": dict(zip(names, ssims)),
                "LPIPS": (dict(zip(names, lpipss)) if lp_weights else None),
                "LPIPS_status": lp_status,
            }
            print(f"  {method}: PSNR {full[method]['PSNR']:.4f} "
                  f"SSIM {full[method]['SSIM']:.4f} "
                  f"LPIPS {full[method]['LPIPS']} ({lp_status})")
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    main()
