"""Live-viewer protocol: wire framing + loop-back serve during a mini run.

The wire format mirrors the SIBR remote viewer (gaussian_renderer/
network_gui.py:26-86): 4-byte LE length-prefixed JSON camera in, raw RGB
bytes + length-prefixed verify string out; view matrices arrive GL-style
transposed with Y/Z column flips.
"""

import json
import os
import socket
import threading
import time
from argparse import Namespace

import numpy as np
import pytest

from gsjax.ops.raster.camera import Camera
from gsjax.viewer.network_gui import NetworkGUI


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _wire_message(cam: Camera, train=True, keep_alive=False, scaling=1.0):
    """Encode a gsjax Camera as the SIBR client would send it."""
    m = np.asarray(cam.world_view, np.float32).T.copy()
    m[:, 1] *= -1
    m[:, 2] *= -1
    f = np.asarray(cam.full_proj, np.float32).T.copy()
    f[:, 1] *= -1
    fovx = 2 * np.arctan(float(cam.tan_fovx))
    fovy = 2 * np.arctan(float(cam.tan_fovy))
    return dict(resolution_x=cam.width, resolution_y=cam.height,
                train=train, fov_y=float(fovy), fov_x=float(fovx),
                z_near=0.01, z_far=100.0, shs_python=False,
                rot_scale_python=False, keep_alive=keep_alive,
                scaling_modifier=float(scaling),
                view_matrix=[float(x) for x in m.reshape(-1)],
                view_projection_matrix=[float(x) for x in f.reshape(-1)])


def _send_msg(conn, msg: dict):
    payload = json.dumps(msg).encode("utf-8")
    conn.sendall(len(payload).to_bytes(4, "little"))
    conn.sendall(payload)


def _recv_exact(conn, n):
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("closed")
        buf += chunk
    return buf


def test_wire_roundtrip_camera():
    """receive() reconstructs the exact matrices the client encoded."""
    port = _free_port()
    gui = NetworkGUI("127.0.0.1", port)
    cam = Camera.create(np.eye(3, dtype=np.float32),
                        np.asarray([0.1, -0.2, 0.5], np.float32),
                        0.9, 0.7, 48, 32)
    client = socket.create_connection(("127.0.0.1", port))
    for _ in range(50):
        gui.try_connect()
        if gui.conn is not None:
            break
        time.sleep(0.05)
    assert gui.conn is not None
    _send_msg(client, _wire_message(cam, scaling=0.7))
    cam_d, do_training, keep_alive, scaling = gui.receive()
    assert (cam_d["width"], cam_d["height"]) == (48, 32)
    assert do_training and not keep_alive and scaling == pytest.approx(0.7)
    np.testing.assert_allclose(cam_d["world_view"],
                               np.asarray(cam.world_view), atol=1e-6)
    np.testing.assert_allclose(cam_d["full_proj"],
                               np.asarray(cam.full_proj), atol=1e-6)
    rebuilt = Camera.from_matrices(cam_d["width"], cam_d["height"],
                                   cam_d["fovx"], cam_d["fovy"],
                                   cam_d["world_view"], cam_d["full_proj"])
    np.testing.assert_allclose(np.asarray(rebuilt.campos),
                               np.asarray(cam.campos), atol=1e-5)
    gui.send(np.zeros((32, 48, 3), np.uint8), "ok")
    assert _recv_exact(client, 32 * 48 * 3) == b"\x00" * (32 * 48 * 3)
    assert int.from_bytes(_recv_exact(client, 4), "little") == 2
    assert _recv_exact(client, 2) == b"ok"
    client.close()
    gui.disconnect()


@pytest.mark.slow
def test_viewer_loopback_during_training(tmp_path):
    """A client connecting mid-run gets a rendered frame + verify string."""
    from gsjax.config import ModelParams
    from gsjax.train.loop import run_training
    from tests.test_data import write_synthetic_colmap
    from tests.test_loop import small_opt

    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=4, width=64, height=32)
    lp = Namespace(**ModelParams._defaults())
    lp.source_path = root
    lp.model_path = str(tmp_path / "out")
    lp.sh_degree = 1
    port = _free_port()
    args = Namespace(test_iterations=[], save_iterations=[],
                     checkpoint_iterations=[], start_checkpoint=None,
                     ip="127.0.0.1", port=port)
    cam = Camera.create(np.eye(3, dtype=np.float32),
                        np.asarray([0.0, 0.0, 2.0], np.float32),
                        0.9, 0.9, 32, 32)
    results = {}

    def client():
        # time-based window: run_training compiles scene setup (KNN, filter)
        # BEFORE binding the GUI listener, which can exceed minutes on a
        # loaded CPU — retry until the deadline, not a fixed attempt count
        deadline = time.time() + 600
        c = None
        while time.time() < deadline:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=0.5)
                break
            except OSError:
                time.sleep(0.2)
        if c is None:
            results["err"] = "could not connect"
            return
        # create_connection's 0.5s timeout sticks to the socket: the first
        # frame waits on the server's render compile (minutes on a loaded
        # CPU), so switch to a generous exchange deadline before recv'ing
        c.settimeout(600)
        try:
            _send_msg(c, _wire_message(cam, train=True, keep_alive=False))
            results["img"] = _recv_exact(c, 32 * 32 * 3)
            vlen = int.from_bytes(_recv_exact(c, 4), "little")
            results["verify"] = _recv_exact(c, vlen).decode("ascii")
        except Exception as e:   # surfaced via asserts below
            results["err"] = repr(e)
        finally:
            c.close()

    t = threading.Thread(target=client, daemon=True)
    t.start()
    run_training(lp, small_opt(iterations=8), None, args)
    t.join(60)
    assert "err" not in results, results.get("err")
    assert results["verify"] == root
    img = np.frombuffer(results["img"], np.uint8)
    assert img.shape[0] == 32 * 32 * 3


def test_native_client_loopback(tmp_path):
    """The C++ sibr_client speaks the wire protocol end-to-end: camera
    matrices decode to a valid orbit pose and the returned frame lands in
    its PPM output."""
    import subprocess

    from gsjax.viewer.client import client_path

    exe = client_path()
    if exe is None:
        pytest.skip("no C++ toolchain")

    port = _free_port()
    gui = NetworkGUI("127.0.0.1", port)
    w, h = 40, 24
    state = {}

    def server():
        for _ in range(400):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.05)
        try:
            for _ in range(2):
                cam_d, do_training, keep_alive, scaling = gui.receive()
                cam = Camera.from_matrices(
                    cam_d["width"], cam_d["height"], cam_d["fovx"],
                    cam_d["fovy"], cam_d["world_view"], cam_d["full_proj"])
                state.setdefault("campos", []).append(np.asarray(cam.campos))
                state["scaling"] = scaling
                wv = np.asarray(cam.world_view)
                state.setdefault("ortho", []).append(
                    np.abs(wv[:3, :3] @ wv[:3, :3].T - np.eye(3)).max())
                img = np.zeros((h, w, 3), np.uint8)
                img[..., 0] = np.arange(w, dtype=np.uint8)[None, :]
                gui.send(img, "golden")
        except Exception as e:
            state["err"] = repr(e)
        finally:
            gui.disconnect()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    out_prefix = str(tmp_path / "fr")
    rc = subprocess.call([exe, "127.0.0.1", str(port), str(w), str(h),
                          "2", out_prefix, "0.8", "3.5"], timeout=60)
    t.join(30)
    assert rc == 0
    assert "err" not in state, state["err"]
    assert state["scaling"] == pytest.approx(0.8)
    # orbit poses: radius 3.5 from origin, orthonormal rotations
    for p in state["campos"]:
        np.testing.assert_allclose(np.linalg.norm(p), 3.5, atol=0.5)
    assert max(state["ortho"]) < 1e-5
    with open(out_prefix + "_001.ppm", "rb") as f:
        assert f.readline().strip() == b"P6"
        assert f.readline().split() == [str(w).encode(), str(h).encode()]
        f.readline()
        data = np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)
    np.testing.assert_array_equal(data[..., 0],
                                  np.tile(np.arange(w, dtype=np.uint8), (h, 1)))
    assert data[..., 1:].max() == 0
