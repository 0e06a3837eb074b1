"""Split sample_depth's reg-phase cost (REG_PROFILE: 207 ms fwd / 553 ms
fwd+bwd at 2.07M points, 100k gaussians) into its pipeline stages, so the
round-4 optimization targets the measured term, not a guess:

  - prep fwd:      preprocess + bin_gaussians + prepare_pairs + pack_features_t
                   (the near-view binning pass sample_depth embeds)
  - prep bwd:      VJP of the above alone (the pair-grad "regather" scatter)
  - layout fwd:    point projection + tile sort + aligned layout gathers
  - kernel fwd:    sample_depth_pallas on pre-packed inputs
  - kernel fwd+bwd kernel plus ONLY its own VJP (d_feats, d_pts)
  - backperm:      round-major value -> original point order
  - full fwd / full fwd+bwd: end-to-end sample_depth (cross-check vs the sum)

Also reports round statistics: live rounds vs the static r_cap grid (dead
rounds run DMA + search scaffolding for nothing), and points-per-tile fill.

Usage: python scripts/profile_sample.py [--iters 5] [--out SAMPLE_PROFILE.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("GSJAX_SAMPLE_BACKEND", "pallas")

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
    from gsjax.ops import sample as sample_mod
    from gsjax.ops.raster import render_pallas, render_ref, sample_pallas
    from gsjax.ops.raster import RasterConfig
    from gsjax.ops.raster.binning import bin_gaussians
    from gsjax.ops.raster.camera import Camera
    from gsjax.ops.raster.preprocess import preprocess
    from gsjax.ops.sample import sample_depth

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
    th = 0.05
    r2 = np.eye(3, dtype=np.float32)
    r2[0, 0] = r2[2, 2] = np.cos(th)
    r2[0, 2] = np.sin(th)
    r2[2, 0] = -np.sin(th)
    near = Camera.create(r2, np.asarray([0.15, 0.0, 0.0], np.float32),
                         1.0, 0.66, width, height)
    cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        1.0, 0.66, width, height)
    cfg = RasterConfig(pair_capacity=1 << 21, live_capacity=1 << 20,
                       max_per_tile=1 << 11,
                       sh_degree=1, require_depth=True)

    # same query cloud as profile_reg: backprojected ref-view depth
    depth = (4.0 + rng.normal(0, 0.1, (height, width))).astype(np.float32)
    xs = (np.arange(width) - cam.cx) / cam.fx
    ys = (np.arange(height) - cam.cy) / cam.fy
    pts = np.stack([depth * xs[None, :], depth * ys[:, None], depth],
                   -1).reshape(-1, 3)
    pts_d = jnp.asarray(pts.astype(np.float32))

    results = {}
    it = args.iters
    xyz, rot = params.xyz, params.rotation
    alive = aux.alive
    scfg = dataclasses.replace(cfg, sh_degree=0, sg_degree=0)

    # ---- prep: preprocess + binning + pack ---------------------------------
    def prep_fwd(xyz_, scales_, rot_, opac_):
        shs = jnp.zeros((xyz_.shape[0], 1, 3))
        prep = preprocess(xyz_, scales_, rot_, opac_, shs, None, None, None,
                          near, scfg, alive)
        binning = bin_gaussians(prep, scfg, width, height)
        feats = render_ref.prepare_pairs(prep, binning, scfg)
        return render_pallas.pack_features_t(feats, scfg), binning

    jprep = jax.jit(lambda *a: prep_fwd(*a)[0])
    timeit(jprep, (xyz, scales, rot, opac), it, "prep fwd", results)

    def prep_loss(xyz_, scales_):
        f, _ = prep_fwd(xyz_, scales_, rot, opac)
        return jnp.sum(f * f)

    timeit(jax.jit(jax.grad(prep_loss, argnums=(0, 1))), (xyz, scales), it,
           "prep fwd+bwd", results)

    # ---- concrete packed inputs for the kernel-only stages ------------------
    feats_t, binning = jax.jit(prep_fwd)(xyz, scales, rot, opac)
    feats_t = jax.block_until_ready(feats_t)

    # replicate _rounds_pallas's layout on concrete arrays
    px, py, t_ray, inside0 = sample_mod._project_points(pts_d, near, scfg)
    q = hw
    tiles_x, tiles_y = scfg.grid(width, height)
    num_tiles = tiles_x * tiles_y
    tile = sample_mod._point_tile(px, py, near, scfg)
    key = jnp.where(inside0, tile, num_tiles).astype(jnp.int32)
    sorted_key, sorted_q = jax.lax.sort(
        (key, jnp.arange(q, dtype=jnp.int32)), num_keys=1)
    bounds = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    pt_start, pt_end = bounds[:-1], bounds[1:]

    p_round = 1024
    a = 128
    pt_count = pt_end - pt_start
    astart = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(-(-pt_count // a) * a).astype(jnp.int32)[:-1]])
    q_al = -(-q // a) * a + num_tiles * a

    def spread_al(vals):
        return jax.lax.cummax(
            jnp.zeros((q_al,), jnp.int32).at[astart].max(vals, mode="drop"))

    ids = jnp.arange(q_al, dtype=jnp.int32)
    sa = spread_al(astart)
    src = spread_al(pt_start) + (ids - sa)
    valid_al = src < spread_al(pt_end)
    src_safe = jnp.where(valid_al, src, 0)
    packed = jnp.stack([px, py], axis=1)
    tgt_raw = sorted_q[src_safe]
    packed_al = jnp.where(valid_al[:, None],
                          packed[jnp.where(valid_al, tgt_raw, 0)], 0.0)
    pts_rows = jnp.pad(packed_al.T, ((0, 2), (0, p_round)))

    acount = -(-pt_count // a) * a
    rpt = -(-acount // p_round)
    r_exc = jnp.cumsum(rpt) - rpt
    r_total = int(r_exc[-1] + rpt[-1])
    r_cap = q_al // p_round + num_tiles + 1

    def spread_r(vals):
        return jax.lax.cummax(
            jnp.zeros((r_cap,), jnp.int32).at[
                jnp.where(rpt > 0, r_exc, r_cap)].max(vals, mode="drop"))

    r_ids = jnp.arange(r_cap, dtype=jnp.int32)
    j = r_ids - spread_r(r_exc)
    live = r_ids < r_total
    round_ps = jnp.where(live, spread_r(astart) + j * p_round, 0)
    round_pc = jnp.where(
        live, jnp.clip(spread_r(astart + acount) - round_ps, 0, p_round), 0)
    round_gs = jnp.where(live, spread_r(binning.tile_start), 0)
    round_ge = spread_r(binning.tile_start + binning.tile_count)
    round_gc = jnp.where(live, round_ge - round_gs, 0)
    round_gs, round_gc, round_ps, round_pc, pts_rows = jax.block_until_ready(
        (round_gs, round_gc, round_ps, round_pc, pts_rows))

    results["r_total (live rounds)"] = r_total
    results["r_cap (grid size)"] = int(r_cap)
    results["mean pts per tile"] = round(float(jnp.mean(pt_count)), 1)
    print(f"rounds: live {r_total} / grid {r_cap}; "
          f"pts/tile mean {results['mean pts per tile']}")

    # ---- layout fwd (everything between projection and the kernel) ---------
    def layout(px_, py_):
        tile_ = sample_mod._point_tile(px_, py_, near, scfg)
        key_ = jnp.where(inside0, tile_, num_tiles).astype(jnp.int32)
        _, sq = jax.lax.sort(
            (jax.lax.stop_gradient(key_), jnp.arange(q, dtype=jnp.int32)),
            num_keys=1)
        pk = jnp.stack([px_, py_], axis=1)
        tgt = sq[src_safe]
        pal = jnp.where(valid_al[:, None],
                        pk[jnp.where(valid_al, tgt, 0)], 0.0)
        return jnp.pad(pal.T, ((0, 2), (0, p_round)))

    timeit(jax.jit(layout), (px, py), it, "layout fwd", results)

    # ---- kernel alone -------------------------------------------------------
    kfwd = jax.jit(lambda f, p: sample_pallas.sample_depth_pallas(
        f, p, round_gs, round_gc, round_ps, round_pc, scfg, int(r_cap),
        p_round, False))
    timeit(kfwd, (feats_t, pts_rows), it, "kernel fwd", results)

    kgrad = jax.jit(jax.grad(lambda f, p: jnp.sum(
        sample_pallas.sample_depth_pallas(
            f, p, round_gs, round_gc, round_ps, round_pc, scfg, int(r_cap),
            p_round, False)[0, :int(q_al)]), argnums=(0, 1)))
    timeit(kgrad, (feats_t, pts_rows), it, "kernel fwd+bwd", results)

    # ---- full path ----------------------------------------------------------
    sd_fwd = jax.jit(lambda p, m, s, qq, o: sample_depth(
        p, m, s, qq, o, near, cfg, alive)["sampled_depth"])
    timeit(sd_fwd, (pts_d, xyz, scales, rot, opac), it, "full fwd", results)

    sd_bwd = jax.jit(jax.grad(
        lambda p, m, s: jnp.sum(sample_depth(
            p, m, s, rot, opac, near, cfg, alive)["sampled_depth"]),
        argnums=(0, 1, 2)))
    timeit(sd_bwd, (pts_d, xyz, scales), it, "full fwd+bwd", results)

    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
