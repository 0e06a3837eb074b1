"""Mesh extraction drivers.

Two routes matching the reference:
  - `extract_mesh_tsdf`: render median depth for all train views and fuse into
    a dense TSDF voxel grid, extract via marching tetrahedra over the grid
    (mesh_extract.py:40-90; open3d's VoxelBlockGrid replaced by an in-house
    jax/numpy fusion).
  - `extract_mesh_tetrahedra`: gaussian corner points -> Delaunay ->
    alpha-field SDF (0.5 - min-view integrated alpha) -> marching tetrahedra
    -> 10-step binary search -> scale filter -> cluster filter
    (mesh_extract_tetrahedra.py:105-181).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gsjax.mesh.cluster import post_process_mesh
from gsjax.mesh.delaunay import triangulate
from gsjax.mesh.tetra import marching_tetrahedra
from gsjax.model import gaussians as gm
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.sample import integrate


# --- tetra points (scene/gaussian_model.py:495-519) --------------------------

_BOX_CORNERS = np.array(
    [[-1, -1, -1], [-1, -1, 1], [-1, 1, -1], [-1, 1, 1],
     [1, -1, -1], [1, -1, 1], [1, 1, -1], [1, 1, 1]], np.float32)
_FACE_CENTERS = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
    np.float32)


def get_tetra_points(params: gm.GaussianParams, aux: gm.GaussianAux,
                     min_opacity: float = 0.0):
    """8 box corners x1.5 + 6 face centers x3 per gaussian (filtered scales)
    + centres; per-vertex scale = 3 * max filtered scale.

    min_opacity > 0 culls gaussians whose FILTERED opacity (the blend-time
    value, gaussian_model.py:189-200) is below it before point generation —
    low-opacity free-space floaters otherwise seed tetra vertices whose
    alpha-cull SDF can cross 0.5 along rays through the floater itself,
    leaving junk surface no view supports."""
    from gsjax.core.quaternion import normalize, to_rotation_matrix

    alive = np.asarray(aux.alive)
    xyz = np.asarray(params.xyz)[alive]
    scale = np.asarray(gm.scaling_with_3d_filter(params, aux.filter_3d))[alive]
    rot = np.asarray(to_rotation_matrix(normalize(params.rotation)))[alive]
    # Delaunay rejects NaN; a NaN-poisoned (render-inert) gaussian that
    # slipped past pruning must not kill the mesher
    ok = (np.isfinite(xyz).all(1) & np.isfinite(scale).all(1)
          & np.isfinite(rot).all((1, 2)))
    if min_opacity > 0.0:
        _, opac = gm.scaling_n_opacity_with_3d_filter(params, aux.filter_3d)
        ok = ok & (np.asarray(opac)[:, 0][alive] >= min_opacity)
    xyz, scale, rot = xyz[ok], scale[ok], rot[ok]

    verts = np.concatenate([_BOX_CORNERS * 1.5, _FACE_CENTERS * 3.0], axis=0)  # [14,3]
    local = verts[None, :, :] * scale[:, None, :]                # [N,14,3]
    world = np.einsum("nij,nkj->nki", rot, local) + xyz[:, None, :]
    pts = np.concatenate([world.reshape(-1, 3), xyz], axis=0)
    s = scale.max(axis=1) * 3.0
    vert_scale = np.concatenate([np.repeat(s, 14), s], axis=0)
    return pts.astype(np.float32), vert_scale.astype(np.float32)


# --- alpha-cull SDF (mesh_extract_tetrahedra.py:64-87) -----------------------

def evaluate_alpha_cull(points, params, aux, views, cfg: RasterConfig,
                        chunk_size: int = 1 << 20):
    """sdf = 0.5 - min over views of integrated alpha; invalid points -> 0.5."""
    scales, opac = gm.scaling_n_opacity_with_3d_filter(params, aux.filter_3d)
    sdf_chunks, valid_chunks = [], []
    n = points.shape[0]
    if n == 0:      # e.g. binary search on a mesh with no crossing edges
        return np.zeros((0,), np.float32), np.zeros((0,), bool)
    for c0 in range(0, n, chunk_size):
        pts = jnp.asarray(points[c0:c0 + chunk_size])
        final = jnp.ones(pts.shape[0])
        any_valid = jnp.zeros(pts.shape[0], bool)
        for v in views:
            ret = integrate(pts, params.xyz, scales, params.rotation, opac,
                            v.camera, cfg, aux.alive)
            ok = ret["inside"]
            if v.mask is not None:
                ok = ok & _sample_mask(v, np.asarray(pts))
            any_valid = any_valid | ok
            final = jnp.where(ok, jnp.minimum(ret["alpha"], final), final)
        final = jnp.where(any_valid, final, 0.0)
        sdf_chunks.append(np.asarray(0.5 - final))
        valid_chunks.append(np.asarray(any_valid))
    return np.concatenate(sdf_chunks), np.concatenate(valid_chunks)


def _sample_mask(view, pts):
    """Bilinear gt-mask validation (mesh_extract_tetrahedra.py:44-61)."""
    cam = view.camera
    wv = np.asarray(cam.world_view)
    pc = pts @ wv[:3, :3].T + wv[:3, 3]
    z = np.maximum(pc[:, 2], 1e-7)
    u = pc[:, 0] / z * float(cam.fx) + float(cam.cx)
    v_ = pc[:, 1] / z * float(cam.fy) + float(cam.cy)
    h, w = view.mask.shape
    ui = np.clip(u, 0, w - 1)
    vi = np.clip(v_, 0, h - 1)
    u0, v0 = np.floor(ui).astype(int), np.floor(vi).astype(int)
    u1, v1 = np.minimum(u0 + 1, w - 1), np.minimum(v0 + 1, h - 1)
    fu, fv = ui - u0, vi - v0
    m = view.mask
    val = (m[v0, u0] * (1 - fu) * (1 - fv) + m[v0, u1] * fu * (1 - fv)
           + m[v1, u0] * (1 - fu) * fv + m[v1, u1] * fu * fv)
    return jnp.asarray(val > 0.5)


def extract_mesh_tetrahedra(params, aux, views, cfg: RasterConfig,
                            n_binary_steps: int = 10, cluster_to_keep: int = 1,
                            min_opacity: float = 0.0, verbose=True):
    """Full tetra route. Returns dict of meshes (init/raw/post).
    min_opacity: optional pre-cull of low-opacity gaussians (floaters)
    before tetra-point generation (see get_tetra_points)."""
    points, points_scale = get_tetra_points(params, aux, min_opacity)
    if verbose:
        print(f"tetra points: {len(points)}; triangulating...", flush=True)
    cells = triangulate(points)
    if verbose:
        print(f"cells: {len(cells)}; evaluating alpha field...", flush=True)
    sdf, valid = evaluate_alpha_cull(points, params, aux, views, cfg)

    edge_verts, edge_sdf, edge_scales, faces, _ = marching_tetrahedra(
        points, cells.astype(np.int64), sdf, points_scale, valid)
    mesh_init = ((edge_verts[:, 0] + edge_verts[:, 1]) * 0.5, faces)

    left, right = edge_verts[:, 0].copy(), edge_verts[:, 1].copy()
    left_sdf, right_sdf = edge_sdf[:, 0].copy(), edge_sdf[:, 1].copy()
    distance = np.linalg.norm(left - right, axis=-1)
    scale_sum = edge_scales[:, 0] + edge_scales[:, 1]

    for step in range(n_binary_steps):
        if verbose:
            print(f"binary search step {step}", flush=True)
        mid = (left + right) * 0.5
        mid_sdf, _ = evaluate_alpha_cull(mid, params, aux, views, cfg)
        low = ((mid_sdf < 0) & (left_sdf < 0)) | ((mid_sdf > 0) & (left_sdf > 0))
        left_sdf = np.where(low, mid_sdf, left_sdf)
        right_sdf = np.where(low, right_sdf, mid_sdf)
        left = np.where(low[:, None], mid, left)
        right = np.where(low[:, None], right, mid)
    verts = (left + right) * 0.5

    # scale-based edge filter (mesh_extract_tetrahedra.py:166-169)
    vmask = distance <= scale_sum
    fmask = vmask[faces].all(axis=1)
    faces_f = faces[fmask]
    used = np.unique(faces_f.reshape(-1))
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    mesh_raw = (verts[used], remap[faces_f])

    mesh_post = post_process_mesh(*mesh_raw, cluster_to_keep)
    return dict(init=mesh_init, raw=mesh_raw, post=mesh_post)


# --- TSDF route (mesh_extract.py) --------------------------------------------

def fuse_tsdf(depths, colors, views, voxel_size=0.002, depth_trunc=8.0,
              sdf_trunc=None, grid_bounds=None, max_voxels=64_000_000,
              verbose=True, with_color=False):
    """Dense TSDF fusion over an AABB derived from the depth maps.

    depths: list of [H,W] z-depth maps (0 = invalid); colors: list of [H,W,3].
    Returns (tsdf [X,Y,Z], weight, color, origin, voxel_size).
    """
    if sdf_trunc is None:
        sdf_trunc = 4 * voxel_size
    if grid_bounds is None:
        mins, maxs = [], []
        for d, v in zip(depths, views):
            dd = np.asarray(d)
            sel = (dd > 0) & (dd < depth_trunc)
            if not sel.any():
                continue
            h, w = dd.shape
            cam = v.camera
            ys, xs = np.nonzero(sel)
            z = dd[ys, xs]
            x = (xs - float(cam.cx)) / float(cam.fx) * z
            y = (ys - float(cam.cy)) / float(cam.fy) * z
            pc = np.stack([x, y, z], -1)
            wv = np.asarray(cam.world_view)
            pw = (pc - wv[:3, 3]) @ wv[:3, :3]
            mins.append(pw.min(0))
            maxs.append(pw.max(0))
        lo = np.min(mins, axis=0) - 4 * voxel_size
        hi = np.max(maxs, axis=0) + 4 * voxel_size
    else:
        lo, hi = grid_bounds
    dims = np.maximum(np.ceil((hi - lo) / voxel_size).astype(int) + 1, 2)
    # bound memory: coarsen if necessary
    while np.prod(dims.astype(np.int64)) > max_voxels:
        voxel_size *= 1.26
        sdf_trunc = 4 * voxel_size
        dims = np.maximum(np.ceil((hi - lo) / voxel_size).astype(int) + 1, 2)
    if verbose:
        print(f"TSDF grid {dims} voxel={voxel_size:.4f}", flush=True)

    import jax
    import jax.numpy as jnp

    tsdf = jnp.zeros(tuple(dims))
    weight = jnp.zeros(tuple(dims))
    # colour fusion is optional: the per-voxel pixel gather materialises a
    # [V, 3] intermediate whose trailing 3-axis pads to the 128-lane tile —
    # 20 GB at a 40M-voxel grid (OOM'd the chip on the blobs golden scene,
    # 2026-08-20) — and the meshing route discards colour anyway.
    color = jnp.zeros(((3,) + tuple(dims)) if with_color else (1, 1))

    # numpy: these are closed over by the jit below, and device-array closure
    # constants stall lowering on the axon relay (see camera.py)
    xs = (lo[0] + voxel_size * np.arange(dims[0])).astype(np.float32)
    ys = (lo[1] + voxel_size * np.arange(dims[1])).astype(np.float32)
    zs = (lo[2] + voxel_size * np.arange(dims[2])).astype(np.float32)

    @jax.jit
    def integrate_view(tsdf, weight, color, depth_img, color_img, wv, fx, fy, cx, cy):
        h, w = depth_img.shape
        gx = xs[:, None, None]
        gy = ys[None, :, None]
        gz = zs[None, None, :]
        px = wv[0, 0] * gx + wv[0, 1] * gy + wv[0, 2] * gz + wv[0, 3]
        py = wv[1, 0] * gx + wv[1, 1] * gy + wv[1, 2] * gz + wv[1, 3]
        pz = wv[2, 0] * gx + wv[2, 1] * gy + wv[2, 2] * gz + wv[2, 3]
        zc = jnp.maximum(pz, 1e-7)
        u = px / zc * fx + cx
        v = py / zc * fy + cy
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        d = depth_img[vi, ui]
        valid = (pz > 0) & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) & \
            (d > 0) & (d < depth_trunc)
        sdf_val = d - pz
        valid = valid & (sdf_val > -sdf_trunc)
        sdf_val = jnp.clip(sdf_val / sdf_trunc, -1.0, 1.0)
        wnew = weight + valid
        tsdf = jnp.where(valid, (tsdf * weight + sdf_val) / jnp.maximum(wnew, 1), tsdf)
        if with_color:
            # channel-separate gathers: a [V,3] row gather would pad 3->128
            c3 = jnp.stack([color_img[..., ch][vi, ui] for ch in range(3)])
            color = jnp.where(
                valid[None],
                (color * weight[None] + c3) / jnp.maximum(wnew, 1)[None],
                color)
        return tsdf, wnew, color

    for d, c, v in zip(depths, colors, views):
        cam = v.camera
        tsdf, weight, color = integrate_view(
            tsdf, weight, color, jnp.asarray(d), jnp.asarray(c),
            cam.world_view, cam.fx, cam.fy, cam.cx, cam.cy)
    return (np.asarray(tsdf), np.asarray(weight), np.asarray(color),
            np.asarray(lo), float(voxel_size))


_CUBE_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], np.int64)


def tsdf_to_mesh(tsdf, weight, origin, voxel_size, min_weight=1.0):
    """Extract the zero isosurface by marching tetrahedra over the grid
    (6 tets per cube). Functional equivalent of o3d extract_triangle_mesh."""
    dims = tsdf.shape
    nx, ny, nz = dims
    # vertex ids
    def vid(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    ix, iy, iz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    base = np.stack([ix, iy, iz], -1).reshape(-1, 3)
    corner_off = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                           [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
    corners = base[:, None, :] + corner_off[None, :, :]            # [C,8,3]
    cids = vid(corners[..., 0], corners[..., 1], corners[..., 2])  # [C,8]
    # keep cubes near the surface with enough weight
    flat_t = tsdf.reshape(-1)
    flat_w = weight.reshape(-1)
    ct = flat_t[cids]
    cw = flat_w[cids]
    active = (cw >= min_weight).all(1) & (np.abs(ct) < 1.0 - 1e-6).any(1) & \
        ((ct > 0).any(1) & (ct < 0).any(1))
    cids = cids[active]
    tets = cids[:, _CUBE_TETS].reshape(-1, 4)

    coords = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                  indexing="ij"), -1).reshape(-1, 3)
    verts_all = origin[None, :] + coords * voxel_size
    valid = flat_w >= min_weight
    ev, es, _, faces, _ = marching_tetrahedra(
        verts_all, tets, flat_t, np.zeros_like(flat_t), valid)
    if len(faces) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    # interpolate the crossing per edge
    s0, s1 = es[:, 0], es[:, 1]
    t = s0 / np.where(np.abs(s0 - s1) > 1e-12, s0 - s1, 1e-12)
    t = np.clip(t, 0.0, 1.0)
    verts = ev[:, 0] + t[:, None] * (ev[:, 1] - ev[:, 0])
    return verts, faces


def extract_mesh_tsdf(render_fn, views, voxel_size=0.002, depth_trunc=8.0,
                      cluster_to_keep=1, verbose=True):
    """TSDF route (mesh_extract.py:40-90): render all train views, fuse, mesh."""
    depths, colors = [], []
    for i, v in enumerate(views):
        out = render_fn(v)
        d = np.asarray(out["median_depth"])
        if v.mask is not None:
            d = np.where(v.mask > 0.5, d, 0.0)
        depths.append(d)
        colors.append(np.clip(np.asarray(out["render"]), 0, 1))
        if verbose:
            print(f"\rrendered {i + 1}/{len(views)}", end="", flush=True)
    if verbose:
        print()
    tsdf, weight, _color, origin, vs = fuse_tsdf(
        depths, colors, views, voxel_size, depth_trunc, verbose=verbose)
    verts, faces = tsdf_to_mesh(tsdf, weight, origin, vs)
    post = post_process_mesh(verts, faces, cluster_to_keep)
    return dict(raw=(verts, faces), post=post, depths=depths)
