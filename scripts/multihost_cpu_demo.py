"""Real multi-PROCESS exercise of the multi-host layer on CPU.

`gsjax/parallel/multihost.py` plumbs jax.distributed flags; this script
proves the plumbing end to end without TPU pod hardware: it spawns two
local processes (one "host" each, 2 virtual CPU devices per process),
initialises jax.distributed, and on the resulting 4-device global mesh

  1. psums each process's contribution across the mesh (collective crosses
     the process boundary),
  2. runs a tiny tiles-sharded train step (`train_step_sharded`) — the
     shard_mapped grads psum over devices living in different processes,
  3. gates artifact writes on `is_primary()` (process 0 writes, 1 doesn't).

Writes MULTIHOST.json with the checked results. The reference has no
distributed layer at all (SURVEY.md section 2.3); this is the TPU-native
framework's multi-host contract test.

Usage: python scripts/multihost_cpu_demo.py [--out MULTIHOST.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["GSJAX_REPO"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["GSJAX_NO_COMPILE_CACHE"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(os.environ["RANK"])

from types import SimpleNamespace
from gsjax.parallel import is_primary, maybe_init_distributed

args = SimpleNamespace(dist_coordinator=os.environ["COORD"],
                       dist_num_processes=2, dist_process_id=rank,
                       dist_auto=False)
assert maybe_init_distributed(args)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gsjax.model import gaussians as gm
from gsjax.ops.knn import mean_knn_dist2_jax
from gsjax.ops.raster import RasterConfig
from gsjax.ops.raster.camera import Camera
from gsjax.parallel import equal_band_bounds, make_mesh, train_step_sharded
from gsjax.train.step import LossConfig

mesh = make_mesh()                      # all 4 global devices, 2 per process
n_global = mesh.devices.size
assert n_global == 4, n_global

# 1. cross-process psum: each device contributes its global position + 1
from functools import partial
@partial(jax.shard_map, mesh=mesh, in_specs=P("tiles"), out_specs=P("tiles"))
def f(x):
    return jax.lax.psum(x, "tiles") * jnp.ones_like(x)

xs = jax.device_put(
    np.arange(1, n_global + 1, dtype=np.float32),
    NamedSharding(mesh, P("tiles")))
# the result spans non-addressable devices; read this process's local shard
psum_val = float(np.asarray(f(xs).addressable_shards[0].data).ravel()[0])

# 2. tiny tiles-sharded train step across the 2-process mesh
rng = np.random.default_rng(0)
n = 64
points = rng.normal(0, 1, (n, 3)).astype(np.float32); points[:, 2] += 4.0
colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
knn = np.asarray(mean_knn_dist2_jax(jnp.asarray(points), chunk=32))
params, aux = gm.init_from_pcd(points, colors, 128, sh_degree=1,
                               sg_degree=0, knn_dist2=knn)
adam = gm.adam_init(params)
cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                    0.9, 0.9, 64, 64)
cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 10,
                   max_per_tile=128, sh_degree=1, require_depth=False)
gt = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
           opacity=0.05, scaling=0.005, rotation=0.001,
           sg_axis=0.002, sg_sharpness=0.095, sg_color=0.00064)
lc = LossConfig(reg_on=False, mv_on=False)
bg = jnp.zeros(3)
rep = NamedSharding(mesh, P())
tiles_y = cfg.grid(64, 64)[1]
params, aux, adam, gt, bg = jax.device_put((params, aux, adam, gt, bg), rep)
losses = []
for _ in range(2):
    params, aux, adam, m = train_step_sharded(
        params, aux, adam, cam, gt, bg, lrs, cfg, lc, mesh,
        row_bounds=equal_band_bounds(tiles_y, n_global),
        rows_per_max=-(-tiles_y // n_global))
    losses.append(float(m["loss"]))

# 3. primary-only artifact write
if is_primary():
    with open(os.path.join(os.environ["OUTDIR"], "artifact.txt"), "w") as fh:
        fh.write("written by process 0")

print(json.dumps({"rank": rank, "process_count": jax.process_count(),
                  "global_devices": n_global,
                  "local_devices": len(jax.local_devices()),
                  "psum": psum_val, "losses": losses,
                  "is_primary": is_primary()}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTIHOST.json")
    ap.add_argument("--port", type=int, default=19357)
    args = ap.parse_args()

    outdir = tempfile.mkdtemp(prefix="gsjax_mh_")
    env = dict(os.environ, GSJAX_REPO=REPO, OUTDIR=outdir,
               COORD=f"127.0.0.1:{args.port}")
    t0 = time.time()
    procs = []
    for rank in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER],
            env=dict(env, RANK=str(rank)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    ok = True
    for rank, p in enumerate(procs):
        try:
            so, se = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            so, se = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
            print(f"--- rank {rank} rc={p.returncode} stderr tail:\n" +
                  "\n".join(se.splitlines()[-15:]), file=sys.stderr)
        line = [l for l in so.splitlines() if l.startswith("{")]
        outs.append(json.loads(line[-1]) if line else None)

    artifact = os.path.join(outdir, "artifact.txt")
    result = {
        "ok": bool(ok and all(outs) and
                   all(o["process_count"] == 2 for o in outs) and
                   all(o["global_devices"] == 4 for o in outs) and
                   all(o["local_devices"] == 2 for o in outs) and
                   all(abs(o["psum"] - 10.0) < 1e-6 for o in outs) and
                   outs[0]["losses"] == outs[1]["losses"] and
                   all(np.isfinite(l) for o in outs for l in o["losses"]) and
                   outs[0]["is_primary"] and not outs[1]["is_primary"] and
                   os.path.exists(artifact)),
        "wall_s": round(time.time() - t0, 1),
        "primary_artifact_written": os.path.exists(artifact),
        "ranks": outs,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
