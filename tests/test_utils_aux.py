"""Aux utility coverage: MVS .dmb readers, LLFF pose export, safe_state."""

import os
import struct
import sys

import numpy as np

from gsjax.utils.mvs import (
    load_pairs_relation,
    read_depth_dmb,
    read_normal_dmb,
    read_propagated_depth,
    write_dmb,
)


def test_dmb_roundtrip(tmp_path):
    d = np.random.default_rng(0).uniform(0.1, 10, (7, 5)).astype(np.float32)
    p = str(tmp_path / "d.dmb")
    write_dmb(p, d)
    np.testing.assert_array_equal(read_depth_dmb(p), d)

    n = np.random.default_rng(1).normal(0, 1, (7, 5, 3)).astype(np.float32)
    p2 = str(tmp_path / "n.dmb")
    write_dmb(p2, n)
    np.testing.assert_array_equal(read_normal_dmb(p2), n)


def test_read_propagated_depth_cleanup(tmp_path):
    depth = np.array([[1.0, np.nan], [-2.0, 500.0]], np.float32)
    cost = np.array([[0.1, np.nan], [-1.0, 0.4]], np.float32)
    nrm = np.zeros((2, 2, 3), np.float32)
    write_dmb(str(tmp_path / "depths.dmb"), depth)
    write_dmb(str(tmp_path / "costs.dmb"), cost)
    write_dmb(str(tmp_path / "normals.dmb"), nrm)
    d, c, n = read_propagated_depth(str(tmp_path))
    np.testing.assert_allclose(d, [[1.0, 300.0], [300.0, 300.0]])
    np.testing.assert_allclose(c, [[0.1, 2.0], [2.0, 0.4]], rtol=1e-6)
    assert n.shape == (2, 2, 3)


def test_load_pairs_relation(tmp_path):
    # 3 images: ref 0 is a test image (dropped), refs 1-2 are training rows
    txt = "3\n0\n2 1 10 2 5\n1\n3 8 0 9 7 16 3\n2\n1 17 4\n"
    p = str(tmp_path / "pair.txt")
    with open(p, "w") as f:
        f.write(txt)
    rel = load_pairs_relation(p)
    # img1: src 8 test (8%8==0) dropped, src 9 -> (9//8)*7+0 = 8... ->
    # id 9 -> (1)*7 + 1 - 1 = 7; src 16 dropped (16%8==0)
    assert rel == [[7], [(17 // 8) * 7 + (17 % 8) - 1]]


def test_llff_poses_bounds(tmp_path):
    """A hand-built 2-camera colmap model yields the right depth bounds."""
    from gsjax.utils.llff import load_colmap_data, save_poses

    sparse = os.path.join(str(tmp_path), "sparse", "0")
    os.makedirs(sparse)
    w, h, f = 64, 48, 70.0
    with open(os.path.join(sparse, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, w, h))
        fh.write(np.array([f, f, w / 2, h / 2], "<f8").tobytes())
    # two identity-rotation cameras at z = 0 and z = -1 (world ahead of both)
    with open(os.path.join(sparse, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 2))
        for i, tz in enumerate([0.0, 1.0]):
            fh.write(struct.pack("<i", i + 1))
            fh.write(np.array([1.0, 0, 0, 0], "<f8").tobytes())
            fh.write(np.array([0.0, 0.0, tz], "<f8").tobytes())
            fh.write(struct.pack("<i", 1))
            fh.write(f"im_{i}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))
    # three points at depths 2, 4, 8 (cam 1), all visible in both images
    with open(os.path.join(sparse, "points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 3))
        for j, z in enumerate([2.0, 4.0, 8.0]):
            fh.write(struct.pack("<Q", j))
            fh.write(np.array([0.0, 0.0, z], "<f8").tobytes())
            fh.write(b"\x80\x80\x80")
            fh.write(struct.pack("<d", 0.5))
            fh.write(struct.pack("<Q", 2))
            fh.write(np.array([1, 0, 2, 0], "<i4").tobytes())

    poses, pts, perm = load_colmap_data(str(tmp_path))
    assert poses.shape == (3, 5, 2)
    np.testing.assert_allclose(poses[:, 4, 0], [h, w, f])
    arr = save_poses(str(tmp_path), poses, pts, perm)
    assert arr.shape == (2, 17)
    assert os.path.exists(os.path.join(str(tmp_path), "poses_bounds.npy"))
    # camera 0 sees depths {2,4,8}; percentile(0.1/99.9) ~ [2, 8]
    np.testing.assert_allclose(arr[0, 15], 2.0, atol=0.1)
    np.testing.assert_allclose(arr[0, 16], 8.0, atol=0.1)
    # camera 1 sits 1 closer along +z -> depths {3,5,9}
    np.testing.assert_allclose(arr[1, 15], 3.0, atol=0.1)
    np.testing.assert_allclose(arr[1, 16], 9.0, atol=0.1)


def test_safe_state_stamps_and_restores(capsys):
    from gsjax.utils.system import safe_state

    old = sys.stdout
    try:
        safe_state(silent=False, seed=0)
        print("hello")
        sys.stdout.flush()
    finally:
        sys.stdout = old
    out = capsys.readouterr().out
    assert out.startswith("hello [") and out.rstrip().endswith("]")
    a = np.random.rand()
    safe_state(silent=True, seed=0)
    sys.stdout = old
    assert np.random.rand() == a


def test_create_videos_and_img_savers(tmp_path):
    import numpy as np

    from gsjax.utils.trajectories import create_videos, save_img_f32, save_img_u8

    rset = tmp_path / "traj" / "ours_1"
    (rset / "renders").mkdir(parents=True)
    (rset / "depth").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        save_img_u8(rng.uniform(0, 1, (32, 48, 3)),
                    str(rset / "renders" / f"{i:05d}.png"))
        save_img_u8(rng.uniform(0, 1, (32, 48, 3)),
                    str(rset / "depth" / f"{i:05d}.png"))
    out = create_videos(str(tmp_path), str(rset), "traj_1", num_frames=6)
    assert len(out) == 2
    for p in out:
        assert os.path.getsize(p) > 500

    f32p = str(tmp_path / "d.tiff")
    save_img_f32(rng.uniform(0, 5, (16, 16)).astype(np.float32), f32p)
    from PIL import Image
    back = np.asarray(Image.open(f32p))
    assert back.dtype == np.float32 and back.shape == (16, 16)
