"""Evaluation toolkit tests."""

import numpy as np

from gsjax.eval.dtu import (align_to_dtu, best_fit_transform, radius_downsample,
                            sample_mesh_points)
from gsjax.eval.tnt import (CropVolume, f1_score, icp_point2point, umeyama,
                            voxel_downsample)


def test_best_fit_transform_recovers_rigid():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (50, 3))
    ang = 0.7
    r_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t_true = np.array([1.0, -2.0, 0.5])
    b = a @ r_true.T + t_true
    r, t = best_fit_transform(a, b)
    np.testing.assert_allclose(r, r_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)


def test_umeyama_with_scale():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, (40, 3))
    s_true = 2.5
    r_true, t_true = best_fit_transform(a, a)[0], np.array([3.0, 0, -1])
    b = s_true * a @ r_true.T + t_true
    s, r, t = umeyama(a, b)
    assert abs(s - s_true) < 1e-6
    np.testing.assert_allclose(s * r @ a[0] + t, b[0], atol=1e-6)


def test_icp_refines_small_offset():
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 1, (2000, 3))
    offset = np.array([0.02, -0.01, 0.015])
    T = icp_point2point(pts + offset, pts, max_dist=0.2)
    moved = (pts + offset) @ T[:3, :3].T + T[:3, 3]
    assert np.abs(moved - pts).mean() < 0.005


def test_f1_identical_clouds(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 1, (5000, 3))
    res, d1, d2 = f1_score(pts, pts, tau=0.05)
    assert res["f1"] > 99.0

    from gsjax.eval.tnt import plot_precision_recall, precision_recall_curves
    th, prec, rec, f1c = precision_recall_curves(d1, d2, 0.05)
    assert f1c[-1] > 99.0 and np.all(np.diff(prec) >= 0)
    path = plot_precision_recall(d1, d2, 0.05, "unittest", str(tmp_path))
    import os
    assert os.path.getsize(path) > 1000


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]])
    out = voxel_downsample(pts, 0.1)
    assert len(out) == 2


def test_sample_mesh_points_density():
    verts = np.array([[0, 0, 0], [2.0, 0, 0], [0, 2.0, 0]])
    faces = np.array([[0, 1, 2]])
    pts = sample_mesh_points(verts, faces, thresh=0.2)
    assert len(pts) > 20
    down = radius_downsample(pts, 0.2)
    assert 10 < len(down) < len(pts)


def test_crop_volume(tmp_path):
    import json
    p = str(tmp_path / "crop.json")
    with open(p, "w") as f:
        json.dump({"orthogonal_axis": "Z", "axis_min": -1, "axis_max": 1,
                   "bounding_polygon": [[-1, -1, 0], [1, -1, 0],
                                        [1, 1, 0], [-1, 1, 0]]}, f)
    cv = CropVolume(p)
    pts = np.array([[0, 0, 0], [2, 0, 0], [0, 0, 5], [0.5, -0.5, 0.5]])
    out = cv.crop(pts)
    assert len(out) == 2


def test_ellipse_trajectory_cameras():
    """generate_path produces look-at cameras circling the capture ring."""
    import numpy as np

    from gsjax.utils.trajectories import apply_depth_colormap, generate_path
    from tests.scene_gen import arc_pose
    from gsjax.ops.raster.camera import Camera

    cams = []
    for i in range(8):
        R, T = arc_pose(i, 8)
        cams.append(Camera.create(R, T, 0.9, 0.7, 64, 48))
    traj = generate_path(cams, n_frames=12)
    assert len(traj) == 12
    for c in traj:
        assert c.width == 64 and c.height == 48
        assert np.isfinite(np.asarray(c.world_view)).all()
    # positions should circle around: distinct camera centres
    centres = np.stack([np.linalg.inv(np.asarray(c.world_view))[:3, 3]
                        for c in traj])
    assert np.ptp(centres, axis=0).max() > 0.5

    cm = apply_depth_colormap(np.array([[0.0, 1.0], [2.0, 3.0]]))
    assert cm.shape == (2, 2, 3) and cm.dtype == np.uint8
