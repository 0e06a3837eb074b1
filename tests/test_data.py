"""Data layer: COLMAP binary writer/reader roundtrip, PLY, Blender reader."""

import json
import os
import struct

import numpy as np
import pytest

from gsjax.data import colmap
from gsjax.data.ply import read_ply, read_pointcloud, write_ply, write_pointcloud
from gsjax.data.readers import (build_nearest_view_graph, load_scene,
                                read_blender_scene, read_colmap_scene)


def write_synthetic_colmap(root, n_images=6, width=32, height=24):
    """Create a minimal binary COLMAP scene + images on disk."""
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    imgdir = os.path.join(root, "images")
    os.makedirs(sparse)
    os.makedirs(imgdir)
    fx, fy = 30.0, 31.0
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))   # PINHOLE
        f.write(np.array([fx, fy, width / 2, height / 2], "<f8").tobytes())

    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.1 * i, 0.0, 0.5 * i])
            f.write(struct.pack("<i", i + 1))
            f.write(q.astype("<f8").tobytes())
            f.write(t.astype("<f8").tobytes())
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))                     # 2 dummy 2D pts
            f.write(np.zeros(2, dtype=np.dtype([("xy", "<f8", 2), ("id", "<i8")])).tobytes())
            img = (rng.random((height, width, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(imgdir, f"img_{i:03d}.png"))

    pts = rng.normal(0, 1, (50, 3))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 50))
        for i in range(50):
            f.write(struct.pack("<Q", i))
            f.write(pts[i].astype("<f8").tobytes())
            f.write(np.array([10, 20, 30], "u1").tobytes())
            f.write(struct.pack("<d", 0.5))
            tl = 3
            f.write(struct.pack("<Q", tl))
            f.write(np.zeros(2 * tl, "<i4").tobytes())
    return pts


def test_colmap_roundtrip(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    pts = write_synthetic_colmap(root)
    info = read_colmap_scene(root, eval_split=True)
    assert len(info.train_views) == 5 and len(info.test_views) == 1
    np.testing.assert_allclose(info.points, pts.astype(np.float32), atol=1e-6)
    v = info.train_views[0]
    assert v.image.shape == (24, 32, 3)
    assert 0 <= v.image.min() and v.image.max() <= 1
    assert info.radius > 0

    build_nearest_view_graph(info.train_views, max_dis=10.0)
    assert any(len(v.nearest_ids) > 0 for v in info.train_views)

    # auto-detect
    info2 = load_scene(root)
    assert len(info2.train_views) == 6


def test_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(1).normal(0, 1, (20, 3)).astype(np.float32)
    rgb = (np.random.default_rng(2).random((20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    write_pointcloud(p, xyz, rgb)
    pts, colors, normals = read_pointcloud(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(colors, rgb / 255.0, atol=1e-6)


def test_ply_faces_roundtrip(tmp_path):
    xyz = np.random.default_rng(1).normal(0, 1, (9, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    p = str(tmp_path / "mesh.ply")
    write_ply(p, dict(x=xyz[:, 0], y=xyz[:, 1], z=xyz[:, 2]), faces=faces)
    v = read_ply(p)
    np.testing.assert_allclose(v["x"], xyz[:, 0], atol=1e-6)
    np.testing.assert_array_equal(v["__faces__"], faces)


def test_blender_reader(tmp_path):
    from PIL import Image

    root = str(tmp_path / "blender")
    os.makedirs(os.path.join(root, "train"))
    frames = []
    rng = np.random.default_rng(0)
    for i in range(3):
        c2w = np.eye(4)
        c2w[2, 3] = -3 - i * 0.1
        frames.append({"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()})
        img = (rng.random((20, 30, 4)) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(os.path.join(root, "train", f"r_{i}.png"))
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    info = read_blender_scene(root, white_background=True)
    assert len(info.train_views) == 3
    assert info.train_views[0].image.shape == (20, 30, 3)
    assert info.points.shape[1] == 3


def test_scene_artifacts(tmp_path):
    from gsjax.core.transforms import fov2focal
    from gsjax.data.readers import write_scene_artifacts

    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root)
    info = read_colmap_scene(root, eval_split=True)
    out = str(tmp_path / "model")
    write_scene_artifacts(out, info)

    # input.ply is a byte copy of the initialisation cloud
    pts, _, _ = read_pointcloud(os.path.join(out, "input.ply"))
    np.testing.assert_allclose(pts, info.points, atol=1e-6)

    # cameras.json: reference order (test first), c2w position/rotation,
    # pixel focals (utils/camera_utils.py:76-96)
    with open(os.path.join(out, "cameras.json")) as f:
        cams = json.load(f)
    views = list(info.test_views) + list(info.train_views)
    assert len(cams) == len(views)
    for i, (c, v) in enumerate(zip(cams, views)):
        assert c["id"] == i and c["img_name"] == v.image_name
        assert (c["width"], c["height"]) == (v.width, v.height)
        np.testing.assert_allclose(c["position"], v.camera_center, atol=1e-5)
        rot = np.array(c["rotation"])
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
        # recover the world->cam transform from the serialized c2w
        np.testing.assert_allclose(rot.T @ -np.array(c["position"]), v.T,
                                   atol=1e-5)
        assert abs(c["fx"] - fov2focal(v.fovx, v.width)) < 1e-4
        assert abs(c["fy"] - fov2focal(v.fovy, v.height)) < 1e-4
