"""Isolate bwd kernel cost vs regather vs fwd parts."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops.raster import RasterConfig
from gsjax.ops.raster import render_pallas, render_ref
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.preprocess import preprocess

width, height, n = 1920, 1080, 100_000
iters = int(os.environ.get("ITERS", 10))
depth = os.environ.get("DEPTH", "1") == "1"

rng = np.random.default_rng(0)
means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
means[:, 2] += 5.0
scales = np.exp(rng.normal(-3.3, 0.3, (n, 3))).astype(np.float32)
quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
quats /= np.linalg.norm(quats, axis=1, keepdims=True)
opac = (1 / (1 + np.exp(-rng.normal(0.0, 1.0, (n, 1))))).astype(np.float32)
shs = rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32)
cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                    1.0, 0.66, width, height)
cfg = RasterConfig(pair_capacity=1 << 21, max_per_tile=1 << 12, sh_degree=3,
                   require_depth=depth)
args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
tiles_x, tiles_y = cfg.grid(width, height)
n_tiles = tiles_x * tiles_y
cam_params = jnp.asarray([cam.fx, cam.fy, 0, 0, 0, width, height, 0], jnp.float32)


@jax.jit
def stage1(*a):
    prep = preprocess(*a, None, None, None, cam, cfg)
    binning = bin_gaussians(prep, cfg, width, height)
    feats = render_ref.prepare_pairs(prep, binning, cfg)
    return (render_pallas.pack_features_t(feats, cfg), binning.tile_start,
            binning.tile_count)


from gsjax.utils.benchsync import sync  # device-scalar fence (ADVICE r2)

feats_t, starts, counts = stage1(*args)
sync(feats_t)

# device arrays go in as ARGUMENTS — closure constants are re-fetched
# host-side at lowering over the slow relay (see losses._gaussian_window)
tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
fwd = jax.jit(lambda ft, ti, st, ct, cp: render_pallas._fwd_call(
    ft, ti, st, ct, cp, cfg, tiles_x, n_tiles, False))
out = fwd(feats_t, tile_ids, starts, counts, cam_params)
sync(out)

g_out = jnp.ones_like(out)
bwdk = jax.jit(lambda ft, ti, st, ct, cp, o, g: render_pallas._bwd_call(
    ft, ti, st, ct, cp, o, g, cfg, tiles_x, n_tiles, False))
d_blocks = bwdk(feats_t, tile_ids, starts, counts, cam_params, out, g_out)
sync(d_blocks)

full_bwd = jax.jit(lambda ft, ti, st, ct, cp, o, g: render_pallas._blend_bwd(
    cfg, tiles_x, n_tiles, False, (ft, ti, st, ct, cp, o), g)[0])
sync(full_bwd(feats_t, tile_ids, starts, counts, cam_params, out, g_out))


def tf(f, *a, label=""):
    sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    sync(o)
    print(f"{label}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")


tf(stage1, *args, label="stage1 (prep+bin+pack)")
tf(fwd, feats_t, tile_ids, starts, counts, cam_params, label="fwd kernel            ")
tf(bwdk, feats_t, tile_ids, starts, counts, cam_params, out, g_out, label="bwd kernel            ")
tf(full_bwd, feats_t, tile_ids, starts, counts, cam_params, out, g_out, label="bwd kernel + regather ")
