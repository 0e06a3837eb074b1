"""PGSR multi-view losses: geometric reprojection + patch-warped NCC.

Equivalent of `PatchMatch.__call__` (utils/loss_utils.py:140-267), dense over
the frame with validity masks instead of gather/compact (static shapes):

  1. backproject the rendered median depth to world points,
  2. differentiably sample the neighbour view's median depth along each
     point's neighbour-pixel ray (`sample_depth`),
  3. reproject the sampled 3D points into the reference view; the pixel error
     is the geometric loss (weights exp(-err), masked at pixel_noise_th),
  4. NCC^2 of plane-warped 7x7 half-step patches between the two gray images,
     masked where 1-ncc >= 0.9 or geometry is inconsistent.

`patchmatch_terms` operates on a horizontal *band* of the reference frame and
returns masked sums + counts, so a tile-sharded train step can give each
device its own band and psum the terms (gsjax/parallel/shard.py); the
full-frame `patchmatch_losses` wrapper keeps the single-chip interface.

Query compaction (round 5): the reference projects EVERY pixel into the
neighbour view (loss_utils.py:146-159) because a CUDA thread on a dead pixel
is free; on TPU every sample_depth row pays the ~10-14 ns/row glue floor, so
pixels that provably contribute nothing — no rendered depth, or projecting
outside the neighbour frustum — are compacted away BEFORE the point layout
when `query_capacity` is set. The pre-mask is a superset of the loss's own
d_mask, so the compacted losses (and their gradients) equal the dense ones
exactly while sample_depth runs on `query_capacity` rows instead of H*W.
Overflow (more valid pixels than capacity) is reported via the `mv_queries`
watermark and bumped by the Trainer like the pair buffers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from gsjax.ops.ncc import warp_patch_ncc
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.sample import _project_points, sample_depth


def _invert_rigid(wv):
    """Closed-form inverse of a [4,4] rigid world->cam matrix."""
    r = wv[:3, :3]
    t = wv[:3, 3]
    inv = jnp.eye(4)
    inv = inv.at[:3, :3].set(r.T)
    inv = inv.at[:3, 3].set(-r.T @ t)
    return inv


def _geo_terms_dense(pts_world, median_depth, means3d, scales, rotations,
                     opacities, alive, ref_cam, near_cam, cfg,
                     pixel_noise_th, row_offset):
    """Dense geometric terms: every band pixel is a sample_depth query.
    Returns (geo_sum, geo_cnt, d_mask [Hs,W], weights [Hs,W], n_queries)."""
    hs, w = median_depth.shape
    fx, fy, cx, cy = ref_cam.fx, ref_cam.fy, ref_cam.cx, ref_cam.cy
    res = sample_depth(pts_world.reshape(-1, 3), means3d, scales, rotations,
                       opacities, near_cam, cfg, alive)
    pts_near = res["point_cam"].reshape(hs, w, 3)
    inside = res["inside"].reshape(hs, w)

    rel = ref_cam.world_view @ _invert_rigid(near_cam.world_view)  # near->ref
    pts_ref = jnp.einsum("hwi,ji->hwj", pts_near, rel[:3, :3],
                         precision=jax.lax.Precision.HIGHEST) + rel[:3, 3]
    z = jnp.maximum(pts_ref[..., 2], 1e-7)
    u = pts_ref[..., 0] / z * fx + cx
    v = pts_ref[..., 1] / z * fy + cy
    uu = jnp.arange(w, dtype=jnp.float32)[None, :]
    vv = (jnp.arange(hs, dtype=jnp.float32) + row_offset)[:, None]
    pixel_noise = jnp.sqrt((u - uu) ** 2 + (v - vv) ** 2 + 1e-12)

    d_mask = jax.lax.stop_gradient(
        inside & (pts_near[..., 2] > 0.2) & (pts_ref[..., 2] > 0.2)
        & (pixel_noise < pixel_noise_th) & (median_depth > 0))
    weights = jax.lax.stop_gradient(
        jnp.where(d_mask, jnp.exp(-pixel_noise), 0.0))
    geo_cnt = jnp.sum(d_mask)
    geo_sum = jnp.sum(jnp.where(d_mask, weights * pixel_noise, 0.0))
    return geo_sum, geo_cnt, d_mask, weights, jnp.asarray(hs * w, jnp.int32)


def _geo_terms_compact(pts_world, median_depth, means3d, scales, rotations,
                       opacities, alive, ref_cam, near_cam, cfg,
                       pixel_noise_th, row_offset, kcap):
    """Compacted geometric terms: only pixels with rendered depth that
    project inside the neighbour frustum become sample_depth queries
    ([kcap] static rows). The pre-mask is a superset of d_mask, so results
    match `_geo_terms_dense` exactly while n_valid <= kcap."""
    barrier = jax.lax.optimization_barrier
    hs, w = median_depth.shape
    q = hs * w
    fx, fy, cx, cy = ref_cam.fx, ref_cam.fy, ref_cam.cx, ref_cam.cy
    pw = pts_world.reshape(-1, 3)
    dep = jax.lax.stop_gradient(median_depth.reshape(-1))

    # dense pre-mask (cheap elementwise math, no gaussians): d_mask requires
    # median_depth > 0 AND sample_depth's `inside` (in_r & inside0, with
    # inside0 = the same _project_points frustum test evaluated here)
    _, _, _, in_near = _project_points(jax.lax.stop_gradient(pw),
                                       near_cam, cfg)
    valid = (dep > 0) & in_near
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    n_valid = pos[-1] + 1
    dst = jnp.where(valid & (pos < kcap), pos, kcap)
    sel = barrier(jnp.zeros((kcap,), jnp.int32).at[dst].set(
        jnp.arange(q, dtype=jnp.int32), mode="drop"))
    slot_live = jnp.arange(kcap, dtype=jnp.int32) < jnp.minimum(n_valid, kcap)

    # three 1-D coordinate gathers (row-form [Q,3] gathers lower to narrow
    # T(2,128)-tiled kernels — see ops/sample.py); dead slots -> exact zeros
    pts_c = jnp.stack(
        [jnp.where(slot_live, barrier(pw[:, i][sel]), 0.0) for i in range(3)],
        axis=-1)

    # compacted queries are SPARSE per tile (tens per 32x32 tile on real
    # scenes), so the point kernel's default 1024-lane rounds run ~90% lane
    # padding; narrower rounds trade more grid steps for less VPU waste
    # (A/B knob GSJAX_MV_PROUND; see AB_r05.json)
    p_round = int(os.environ.get("GSJAX_MV_PROUND", "256") or 256)
    res = sample_depth(pts_c, means3d, scales, rotations, opacities,
                       near_cam, cfg, alive, point_batch=p_round)
    pts_near = res["point_cam"]                                   # [kcap,3]
    inside = res["inside"] & slot_live

    rel = ref_cam.world_view @ _invert_rigid(near_cam.world_view)  # near->ref
    pts_ref = jnp.einsum("ki,ji->kj", pts_near, rel[:3, :3],
                         precision=jax.lax.Precision.HIGHEST) + rel[:3, 3]
    z = jnp.maximum(pts_ref[:, 2], 1e-7)
    u = pts_ref[:, 0] / z * fx + cx
    v = pts_ref[:, 1] / z * fy + cy
    uu = (sel % w).astype(jnp.float32)
    vv = (sel // w).astype(jnp.float32) + row_offset
    pixel_noise = jnp.sqrt((u - uu) ** 2 + (v - vv) ** 2 + 1e-12)

    d_mask_c = jax.lax.stop_gradient(
        inside & (pts_near[:, 2] > 0.2) & (pts_ref[:, 2] > 0.2)
        & (pixel_noise < pixel_noise_th))          # dep > 0 is in the pre-mask
    weights_c = jax.lax.stop_gradient(
        jnp.where(d_mask_c, jnp.exp(-pixel_noise), 0.0))
    geo_cnt = jnp.sum(d_mask_c)
    geo_sum = jnp.sum(jnp.where(d_mask_c, weights_c * pixel_noise, 0.0))

    # full-frame weights for the NCC masking (one stop-grad 1-D scatter;
    # weights > 0 <=> d_mask since pixel_noise < th = exp(-noise) > 0)
    tgt = jnp.where(d_mask_c, sel, q)
    w_full = barrier(jnp.zeros((q,)).at[tgt].set(weights_c, mode="drop"))
    weights = w_full.reshape(hs, w)
    d_mask = weights > 0
    return geo_sum, geo_cnt, d_mask, weights, n_valid


def patchmatch_terms(median_depth: jax.Array,
                     normal: jax.Array,
                     means3d, scales, rotations, opacities, alive,
                     ref_cam: Camera, near_cam: Camera,
                     gray_r: jax.Array, gray_n: jax.Array,
                     cfg: RasterConfig,
                     pixel_noise_th: float = 1.0,
                     patch_size: int = 3,
                     row_offset: jax.Array | int = 0,
                     query_capacity: int | None = None,
                     ncc_block_capacity: int | None = None):
    """Band-level PGSR terms.

    median_depth/normal: [Hs,W(,3)] rows `row_offset..row_offset+Hs` of the
    reference frame; gray_r/gray_n: FULL [H,W] luma images.
    query_capacity: static sample_depth query-row budget (None = dense, one
    query per pixel). See the module docstring.
    ncc_block_capacity: static budget of 16x16 pixel blocks for the
    block-compacted NCC (`warp_patch_ncc_blocks`): the homography/tap/
    statistic math and the Pallas sampler run only over blocks containing a
    d_mask pixel instead of the whole frame. None = dense NCC.
    Returns (ncc_sum, ncc_cnt, geo_sum, geo_cnt, win_rej, n_queries,
    n_blocks) scalars (masked sums; win_rej counts pixels whose NCC was
    dropped ONLY by the Pallas sampler's block window — observability for
    extreme warps, ADVICE r4; n_queries/n_blocks are the capacity
    watermarks)."""
    hs, w = median_depth.shape
    fx, fy, cx, cy = ref_cam.fx, ref_cam.fy, ref_cam.cx, ref_cam.cy

    # 1. backproject the band's median depth -> world points (loss_utils.py:146-159)
    xs = (jnp.arange(w, dtype=jnp.float32) - cx) / fx
    ys = (jnp.arange(hs, dtype=jnp.float32) + row_offset - cy) / fy
    pts_cam = jnp.stack([median_depth * xs[None, :], median_depth * ys[:, None],
                         median_depth], axis=-1)
    inv_r = _invert_rigid(ref_cam.world_view)
    pts_world = jnp.einsum("hwi,ji->hwj", pts_cam, inv_r[:3, :3],
                           precision=jax.lax.Precision.HIGHEST) + inv_r[:3, 3]

    # 2+3. sample the neighbour's median depth along each valid point's ray
    # and reproject into the ref view; the pixel error is the geometric loss
    geo_args = (pts_world, median_depth, means3d, scales, rotations,
                opacities, alive, ref_cam, near_cam, cfg, pixel_noise_th,
                row_offset)
    if query_capacity is None:
        geo_sum, geo_cnt, d_mask, weights, n_queries = \
            _geo_terms_dense(*geo_args)
    else:
        geo_sum, geo_cnt, d_mask, weights, n_queries = \
            _geo_terms_compact(*geo_args, query_capacity)

    # 4. NCC over the masked band pixels (loss_utils.py:227-267)
    # double-where: norm() has NaN gradient at 0-normals (empty pixels)
    nrm2 = jnp.sum(normal * normal, axis=-1, keepdims=True)
    good = nrm2 > 1e-20
    nrm = jnp.where(good, normal * jax.lax.rsqrt(jnp.where(good, nrm2, 1.0)), 0.0)
    rel_rn = near_cam.world_view @ _invert_rigid(ref_cam.world_view)  # ref->near
    if ncc_block_capacity is not None:
        from gsjax.ops.ncc import warp_patch_ncc_blocks
        ncc_sum, ncc_cnt, win_rej, n_blocks = warp_patch_ncc_blocks(
            median_depth, nrm, gray_r, gray_n,
            rel_rn[:3, :3], rel_rn[:3, 3],
            (fx, fy, cx, cy),
            (near_cam.fx, near_cam.fy, near_cam.cx, near_cam.cy),
            d_mask, weights, ncc_block_capacity,
            radius=patch_size, row_offset=row_offset)
        return (ncc_sum, ncc_cnt, geo_sum, geo_cnt, win_rej, n_queries,
                n_blocks)
    cc, cc_valid, win_rej = warp_patch_ncc(
        median_depth, nrm, gray_r, gray_n,
        rel_rn[:3, :3], rel_rn[:3, 3],
        (fx, fy, cx, cy),
        (near_cam.fx, near_cam.fy, near_cam.cx, near_cam.cy),
        radius=patch_size, row_offset=row_offset, with_stats=True)
    ncc = jnp.clip(1.0 - cc, 0.0, 2.0)
    ncc_mask = jax.lax.stop_gradient((ncc < 0.9) & cc_valid & d_mask)
    ncc_cnt = jnp.sum(ncc_mask)
    ncc_sum = jnp.sum(jnp.where(ncc_mask, ncc * weights, 0.0))
    return (ncc_sum, ncc_cnt, geo_sum, geo_cnt, win_rej, n_queries,
            jnp.zeros((), jnp.int32))


def patchmatch_losses(median_depth: jax.Array,
                      normal: jax.Array,
                      means3d, scales, rotations, opacities, alive,
                      ref_cam: Camera, near_cam: Camera,
                      gray_r: jax.Array, gray_n: jax.Array,
                      cfg: RasterConfig,
                      pixel_noise_th: float = 1.0,
                      patch_size: int = 3,
                      query_capacity: int | None = None,
                      ncc_block_capacity: int | None = None):
    """Full-frame wrapper. Returns (ncc_loss, geo_loss, win_rej, n_queries,
    n_blocks) scalars (win_rej = pixels dropped only by the NCC sampler
    window — a persistently large count means the GSJAX_NCC_RU footprint is
    too narrow for the scene's homographies; n_queries/n_blocks are the
    mv_queries / ncc-block watermarks for capacity bumping)."""
    (ncc_sum, ncc_cnt, geo_sum, geo_cnt, win_rej, n_queries,
     n_blocks) = patchmatch_terms(
        median_depth, normal, means3d, scales, rotations, opacities, alive,
        ref_cam, near_cam, gray_r, gray_n, cfg, pixel_noise_th, patch_size,
        query_capacity=query_capacity,
        ncc_block_capacity=ncc_block_capacity)
    geo_loss = geo_sum / jnp.maximum(geo_cnt, 1)
    ncc_loss = ncc_sum / jnp.maximum(ncc_cnt, 1)
    any_mask = geo_cnt > 0
    return (jnp.where(any_mask, ncc_loss, 0.0),
            jnp.where(any_mask, geo_loss, 0.0),
            win_rej, n_queries, n_blocks)
