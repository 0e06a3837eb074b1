"""Scaling benchmark: sharded train-step rays/s over a 1..N device mesh.

Measures the full `train_step_sharded` (per-device row-band binning + Pallas/
XLA tile blend + banded L1/SSIM/depth-normal losses + psum'd grads + Adam) at
a fixed frame / gaussian count, strong-scaling over mesh sizes 1, 2, 4, ... N,
and reports the largest mesh's efficiency  eff(n) = T(1) / (n * T(n)).

This is the `BASELINE.md:21` protocol ("≥80% rays/s scaling efficiency 1 chip
→ 2 hosts"). On real multi-chip hardware the numbers are the deliverable; on
a single-chip or CPU image the virtual-device mesh (XLA
--xla_force_host_platform_device_count) still validates the sharding's
work-partitioning: per-device pair buffers, banded losses and collectives are
the real graph, only the interconnect is simulated. Virtual devices share one
host's cores, so CPU "efficiency" is a lower bound (device programs are
dispatched concurrently but contend for the same ALUs).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} where value is
eff(N) and vs_baseline is against the 0.80 north-star target, plus a per-N
rays/s table on stderr. Writes SCALING.json with the full table.

Env: GSJAX_BENCH_{WIDTH,HEIGHT,N,ITERS}, GSJAX_SCALING_DEVICES (max mesh
size; default = all available devices). GSJAX_SCALING_MODE=views benchmarks
the serving path instead (`render_views_sharded`: whole views data-parallel
over the mesh, one frame per device per round) and reports views/s scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_EFFICIENCY = 0.80


def build_inputs(width, height, n):
    import jax.numpy as jnp

    from gsjax.model import gaussians as gm
    from gsjax.ops.knn import mean_knn_dist2
    from gsjax.ops.raster.camera import Camera

    rng = np.random.default_rng(0)
    means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
    means[:, 2] += 5.0
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        1.0, 0.66, width, height)
    params, aux = gm.init_from_pcd(means, colors, n, 3, 0,
                                   mean_knn_dist2(means))
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    return params, aux, cam, gt


def main():
    import jax

    # the axon-relay jaxlib ignores the JAX_PLATFORMS env var; force the
    # platform through the config (how tests/conftest.py pins CPU) so the
    # virtual-device mesh run actually leaves the TPU alone
    plat = os.environ.get("GSJAX_SCALING_PLATFORM", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from gsjax.model import gaussians as gm
    from gsjax.ops.raster import RasterConfig
    from gsjax.parallel import make_mesh, train_step_sharded
    from gsjax.train.step import LossConfig

    width = int(os.environ.get("GSJAX_BENCH_WIDTH", 1920))
    height = int(os.environ.get("GSJAX_BENCH_HEIGHT", 1080))
    n = int(os.environ.get("GSJAX_BENCH_N", 100_000))
    pair_cap = int(os.environ.get("GSJAX_BENCH_PAIRS", 1 << 21))
    iters = int(os.environ.get("GSJAX_BENCH_ITERS", 5))
    n_avail = len(jax.devices())
    n_max = int(os.environ.get("GSJAX_SCALING_DEVICES", n_avail))
    n_max = min(n_max, n_avail)

    params, aux, cam, gt = build_inputs(width, height, n)
    adam = gm.adam_init(params)
    bg = jnp.zeros(3)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.0, sg_sharpness=0.0, sg_color=0.0)
    lc = LossConfig(reg_on=True)

    if os.environ.get("GSJAX_SCALING_MESHES"):
        meshes = [int(x) for x in
                  os.environ["GSJAX_SCALING_MESHES"].split(",")]
        meshes = [d for d in meshes if d <= n_avail]
    else:
        meshes = []
        d = 1
        while d <= n_max:
            meshes.append(d)
            d *= 2
    mode = os.environ.get("GSJAX_SCALING_MODE", "train")
    rows = []
    for nd in meshes:
        mesh = make_mesh(nd)
        # per-device pair buffer shrinks with the mesh: each device bins only
        # its own row band (the whole point of the scaling)
        dev_cap = max(1 << 14, pair_cap // nd)
        cfg = RasterConfig(pair_capacity=pair_cap, max_per_tile=1 << 11,
                           sh_degree=3, require_depth=True)
        if mode == "views":
            # serving path: nd whole frames per round, one per device
            from gsjax.parallel import render_views_sharded
            from gsjax.ops.raster.camera import Camera

            def rot_cam(a):
                c, s = np.cos(a), np.sin(a)
                r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
                return Camera.create(r, np.zeros(3, np.float32), 1.0, 0.66,
                                     width, height)

            cams = [rot_cam(0.02 * i) for i in range(nd)]
            step = lambda: render_views_sharded(  # noqa: E731
                params, aux, cams, cfg, bg, mesh)
            per_round = nd   # frames per timed call
        else:
            band_kw = {}
            if mode == "train_balanced" and nd > 1:
                # one warm step with equal bands harvests the per-row pair
                # histogram; the timed loop then uses equal-PAIR bounds —
                # exactly what the Trainer does every step. On a synthetic
                # centred scene the win mirrors real scenes' central
                # clustering (PERF.md "band load imbalance").
                from gsjax.parallel import balance_band_bounds
                _, _, _, m0 = train_step_sharded(
                    params, aux, adam, cam, gt, bg, lrs, cfg, lc, mesh,
                    dev_pair_capacity=dev_cap)
                hist = np.asarray(m0["row_pairs"])
                tiles_y = len(hist)
                rpm = min(tiles_y, -(-tiles_y // nd) * 2)
                band_kw = dict(row_bounds=balance_band_bounds(hist, nd, rpm),
                               rows_per_max=rpm)
            step = lambda: train_step_sharded(  # noqa: E731
                params, aux, adam, cam, gt, bg, lrs, cfg, lc, mesh,
                dev_pair_capacity=dev_cap, **band_kw)
            per_round = 1
        # fence with a per-shard device-side scalar fetch (ADVICE r2: in
        # views mode the first leaf is nd stacked ~24MB frames, and a
        # replicated leaf's plain host read bounds only one device's stream)
        from gsjax.utils.benchsync import sync

        t0 = time.perf_counter()
        out = step()
        sync(out)
        warm = time.perf_counter() - t0
        sync(step())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step()
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        rays = width * height * per_round / dt
        rows.append({"devices": nd, "iter_s": round(dt, 4),
                     "rays_per_s": round(rays, 1),
                     "frames_per_round": per_round,
                     "dev_pair_capacity": dev_cap})
        print(f"n={nd}: {dt * 1e3:.1f} ms/round ({per_round} frame(s)), "
              f"{rays / 1e6:.2f} Mrays/s (warmup {warm:.0f}s)",
              file=sys.stderr)

    # strong-scaling efficiency on per-frame throughput: rays/s(n) / (n *
    # rays/s(1)) — in train mode per_round==1 so this is the usual T1/(n*Tn);
    # in views mode each round renders n frames so it reduces to T1/Tn.
    #
    # On a VIRTUAL CPU mesh the n "devices" share the same host cores, so a
    # timing ratio measures nothing but oversubscription — efficiency is
    # reported null there (VERDICT r2: an unexplained "0.12 efficiency" in a
    # results file reads as a real scaling number). The runs still validate
    # that the sharded step compiles + executes at every mesh size; the
    # hardware-independent scaling *prediction* lives in
    # scripts/scaling_model.py (per-device pair shares + psum bytes vs ICI).
    virtual = jax.devices()[0].platform == "cpu"
    r1 = rows[0]["rays_per_s"]
    for r in rows:
        r["efficiency"] = (None if virtual else
                           round(r["rays_per_s"] / (r["devices"] * r1), 4))
    eff = rows[-1]["efficiency"]
    table = {"platform": jax.devices()[0].platform,
             "virtual_devices": virtual,
             "mode": mode,
             "width": width, "height": height, "n_gaussians": n,
             "rows": rows}
    if virtual:
        table["note"] = ("correctness-only: virtual devices share host "
                         "cores, timing-based efficiency is meaningless; "
                         "see scripts/scaling_model.py for the analytic "
                         "prediction real hardware can falsify")
    out_name = "SCALING.json" if mode == "train" else "SCALING_views.json"
    with open(os.path.join(os.path.dirname(__file__) or ".",
                           out_name), "w") as f:
        json.dump(table, f, indent=1)
    if virtual:
        print(json.dumps({
            "metric": f"{mode}_scaling_correctness_{rows[-1]['devices']}dev",
            "value": 1.0, "unit": "sharded step ran at every mesh size "
            "(virtual CPU mesh: efficiency N/A)", "vs_baseline": 1.0}))
    else:
        print(json.dumps({
            "metric": f"{mode}_scaling_efficiency_{rows[-1]['devices']}dev",
            "value": eff,
            "unit": "rays_per_s(n)/(n*rays_per_s(1))",
            "vs_baseline": round(eff / TARGET_EFFICIENCY, 4),
        }))


if __name__ == "__main__":
    main()
