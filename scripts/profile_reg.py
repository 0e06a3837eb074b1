"""Profile the reg-phase (PatchMatch) components at 1080p on real TPU.

bench_reg measured 9.1 s/iter for the full reg step vs 0.28 s for the
rasterizer-only step. Prime suspect: warp_patch_ncc's 49 taps x 2 images x
4-corner bilinear gathers = ~800M scalar gathers per call. This times each
piece and the candidate XLA-level fixes:

  - sample_depth fwd / fwd+bwd at H*W query points
  - warp_patch_ncc fwd / fwd+bwd (status quo)
  - gather micro: 2D img[v,u] vs flattened 1D img.ravel()[v*w+u]
  - c_r taps via static shifts (regular grid => no gather at all)

Usage: python scripts/profile_reg.py [--iters 5] [--out REG_PROFILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_stages import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsjax.model import gaussians as gm
    from gsjax.ops.ncc import warp_patch_ncc
    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.sample import sample_depth
    from gsjax.train.multiview import patchmatch_terms

    width, height, n = args.width, args.height, args.n
    hw = height * width
    rng = np.random.default_rng(0)
    points = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    points[:, 2] += 5.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, aux = gm.init_from_pcd(points, colors, n, sh_degree=1,
                                   sg_degree=0,
                                   knn_dist2=np.full((n,), 1e-4, np.float32))
    scales, opac = gm.scaling_n_opacity_with_3d_filter(params, aux.filter_3d)
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
                       max_per_tile=1 << 11,
                       sh_degree=1, require_depth=True)

    depth = jnp.asarray(
        (4.0 + rng.normal(0, 0.1, (height, width))).astype(np.float32))
    nrm = np.concatenate([rng.normal(0, 0.05, (height, width, 2)),
                          -np.ones((height, width, 1))], -1)
    nrm = jnp.asarray((nrm / np.linalg.norm(nrm, axis=-1, keepdims=True))
                      .astype(np.float32))
    gray_r = jnp.asarray(rng.uniform(0, 1, (height, width)).astype(np.float32))
    gray_n = jnp.asarray(rng.uniform(0, 1, (height, width)).astype(np.float32))

    results = {}
    it = args.iters

    # ---- sample_depth ---------------------------------------------------------
    xs = (np.arange(width) - cam.cx) / cam.fx
    ys = (np.arange(height) - cam.cy) / cam.fy
    d0 = np.asarray(depth)
    pts = np.stack([d0 * xs[None, :], d0 * ys[:, None], d0], -1).reshape(-1, 3)
    pts_d = jnp.asarray(pts.astype(np.float32))

    sd_fwd = jax.jit(lambda p, m, s, q, o: sample_depth(
        p, m, s, q, o, near, cfg, aux.alive)["sampled_depth"])
    timeit(sd_fwd, (pts_d, params.xyz, scales, params.rotation, opac), it,
           f"sample_depth fwd @{hw // 1000}k pts", results)

    sd_bwd = jax.jit(jax.grad(
        lambda p, m: jnp.sum(sample_depth(
            p, m, scales, params.rotation, opac, near, cfg,
            aux.alive)["sampled_depth"]), argnums=(0, 1)))
    timeit(sd_bwd, (pts_d, params.xyz), it, "sample_depth fwd+bwd", results)

    # ---- NCC ------------------------------------------------------------------
    rel = np.asarray(near.world_view @ np.linalg.inv(np.asarray(cam.world_view)))
    rel_r = jnp.asarray(rel[:3, :3].astype(np.float32))
    rel_t = jnp.asarray(rel[:3, 3].astype(np.float32))
    intr = (cam.fx, cam.fy, cam.cx, cam.cy)

    ncc_fwd = jax.jit(lambda d, nm, gr, gn: warp_patch_ncc(
        d, nm, gr, gn, rel_r, rel_t, intr, intr)[0])
    timeit(ncc_fwd, (depth, nrm, gray_r, gray_n), it, "ncc fwd (49 taps)",
           results)

    ncc_bwd = jax.jit(jax.grad(lambda d, nm: jnp.sum(warp_patch_ncc(
        d, nm, gray_r, gray_n, rel_r, rel_t, intr, intr)[0]),
        argnums=(0, 1)))
    timeit(ncc_bwd, (depth, nrm), it, "ncc fwd+bwd", results)

    # ---- gather micro ---------------------------------------------------------
    vi = jnp.asarray(rng.integers(0, height, hw, dtype=np.int32))
    ui = jnp.asarray(rng.integers(0, width, hw, dtype=np.int32))
    timeit(jax.jit(lambda g, v, u: g[v, u]), (gray_n, vi, ui), it,
           "gather2d 2M", results)
    timeit(jax.jit(lambda g, v, u: g.ravel()[v * width + u]),
           (gray_n, vi, ui), it, "gather1d 2M", results)
    lin = jnp.asarray(
        rng.integers(0, hw, (hw, 4), dtype=np.int32))
    timeit(jax.jit(lambda g, i: g.ravel()[i]), (gray_n, lin), it,
           "gather1d 2Mx4 (batched corners)", results)

    # full patchmatch_terms (what the train step embeds)
    pm = jax.jit(lambda d, nm, m: patchmatch_terms(
        d, nm, m, scales, params.rotation, opac, aux.alive, cam, near,
        gray_r, gray_n, cfg))
    timeit(pm, (depth, nrm, params.xyz), it, "patchmatch_terms fwd", results)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
