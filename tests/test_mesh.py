"""Mesh subsystem tests: marching tets on analytic SDFs, TSDF fusion,
and the full alpha-field tetra route on a tiny synthetic scene."""

import numpy as np
import pytest

from gsjax.mesh.cluster import post_process_mesh
from gsjax.mesh.delaunay import triangulate
from gsjax.mesh.extract import (extract_mesh_tetrahedra, fuse_tsdf,
                                get_tetra_points, tsdf_to_mesh)
from gsjax.mesh.tetra import marching_tetrahedra


def test_marching_tets_sphere():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (4000, 3)).astype(np.float32)
    cells = triangulate(pts)
    sdf = np.linalg.norm(pts, axis=1) - 1.0
    valid = np.ones(len(pts), bool)
    ev, es, _, faces, _ = marching_tetrahedra(pts, cells.astype(np.int64), sdf,
                                              np.zeros(len(pts)), valid)
    assert len(faces) > 500
    # crossing edge midpoints lie near the unit sphere
    mid = (ev[:, 0] + ev[:, 1]) / 2
    r = np.linalg.norm(mid, axis=1)
    assert np.abs(r - 1.0).mean() < 0.1
    # all faces reference valid edges
    assert faces.min() >= 0 and faces.max() < len(ev)
    # sdf signs straddle zero on each edge
    assert np.all((es[:, 0] > 0) != (es[:, 1] > 0))


def test_cluster_filter_keeps_largest():
    # two separate triangle fans; the small one must be dropped (min 50 rule)
    v_big = np.random.default_rng(1).normal(0, 1, (80, 3))
    f_big = np.stack([np.zeros(78, int), np.arange(1, 79), np.arange(2, 80)], -1)
    v_small = v_big + 100
    f_small = np.array([[0, 1, 2]]) + 80
    verts = np.concatenate([v_big, v_small])
    faces = np.concatenate([f_big, f_small])
    v2, f2 = post_process_mesh(verts, faces, 1)
    assert len(f2) == 78
    assert f2.max() < len(v2)


def test_tsdf_sphere_roundtrip():
    """Fuse synthetic depth maps of a sphere seen from 6 directions; the
    extracted mesh should approximate the sphere."""
    from gsjax.ops.raster.camera import Camera

    class V:
        def __init__(self, cam):
            self.camera = cam
            self.mask = None

    radius = 0.5
    views, depths, colors = [], [], []
    w = h = 64
    for axis in range(6):
        # camera at distance 2 looking at origin along +-xyz
        look = np.zeros(3)
        eye = np.zeros(3)
        eye[axis % 3] = 2.0 * (1 if axis < 3 else -1)
        forward = (look - eye)
        forward /= np.linalg.norm(forward)
        up = np.array([0, 0, 1.0]) if axis % 3 != 2 else np.array([0, 1.0, 0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        R = np.stack([right, down, forward], axis=1)  # cam->world columns
        T = -R.T @ eye
        cam = Camera.create(R.astype(np.float32), T.astype(np.float32),
                            0.6, 0.6, w, h)
        # analytic sphere depth
        fx = float(cam.fx)
        xs = (np.arange(w) - (w - 1) / 2) / fx
        ys = (np.arange(h) - (h - 1) / 2) / float(cam.fy)
        dirs = np.stack(np.broadcast_arrays(xs[None, :], ys[:, None], np.ones((h, w))), -1)
        dirs_n = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        # ray-sphere: camera at distance 2, sphere at origin radius .5
        oc = 2.0
        b = -oc * dirs_n[..., 2]
        disc = b * b - (oc * oc - radius * radius)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        depth = np.where(hit, t * dirs_n[..., 2], 0.0)  # z-depth
        views.append(V(cam))
        depths.append(depth.astype(np.float32))
        colors.append(np.ones((h, w, 3), np.float32) * 0.5)

    tsdf, weight, color, origin, vs = fuse_tsdf(depths, colors, views,
                                                voxel_size=0.025, verbose=False)
    verts, faces = tsdf_to_mesh(tsdf, weight, origin, vs)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - radius) < 0.05


@pytest.mark.slow
def test_extract_mesh_tetrahedra_runs():
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig
    from tests.test_train_step import make_model
    from tests.util import look_at_camera

    class V:
        def __init__(self, cam):
            self.camera = cam
            self.mask = None

    params, aux = make_model(n=60, capacity=100, seed=4)
    pts, scale = get_tetra_points(params, aux)
    assert pts.shape[0] == 60 * 15
    views = [V(look_at_camera(width=64, height=64))]
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=0)
    meshes = extract_mesh_tetrahedra(params, aux, views, cfg,
                                     n_binary_steps=2, verbose=False)
    v, f = meshes["raw"]
    assert np.isfinite(v).all()


def test_cull_mesh_frustum_and_depth():
    """Faces behind the camera (or occluded beyond the rendered depth) are
    dropped; survivors keep a compact vertex table."""
    import numpy as np

    from gsjax.mesh.cluster import cull_mesh
    from gsjax.ops.raster.camera import Camera

    cam = Camera.create(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        0.9, 0.9, 32, 32)
    # two triangles: one ahead of the camera (z=+2), one behind (z=-2)
    verts = np.array([
        [0.0, 0.0, 2.0], [0.1, 0.0, 2.0], [0.0, 0.1, 2.0],
        [0.0, 0.0, -2.0], [0.1, 0.0, -2.0], [0.0, 0.1, -2.0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    v2, f2 = cull_mesh(verts, faces, [cam])
    assert len(f2) == 1 and len(v2) == 3
    np.testing.assert_allclose(v2, verts[:3])

    # with an occluding depth map at z=1, the z=2 triangle is culled too
    depth = np.full((32, 32), 1.0, np.float32)
    v3, f3 = cull_mesh(verts, faces, [cam], depths=[depth])
    assert len(f3) == 0
