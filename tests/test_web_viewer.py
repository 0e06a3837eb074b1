"""Browser viewer: orbit camera math, HTTP frame endpoint, SIBR bridge.

The web viewer replaces the reference's SIBR_viewers GUI application: the
HTML/JS page posts orbit parameters, the server renders frames either by
bridging the SIBR wire protocol to a live trainer (network_gui.py) or by
rendering a trained model dir in-process.
"""

import http.client
import json
import os
import threading
import time

import numpy as np
import pytest

from gsjax.viewer.network_gui import NetworkGUI
from gsjax.viewer.web import (LocalModel, SIBRBridge, WebViewer, look_at,
                              orbit_matrices, projection)


def _free_port():
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_orbit_matrices_geometry():
    """The orbit camera sits at distance `radius` from the target, looks at
    it (+z in view space), and the projection maps it to clip center."""
    target = np.array([0.3, -0.2, 1.0])
    wv, fp, fovy = orbit_matrices(yaw=0.7, pitch=0.4, radius=2.5,
                                  target=target, fovx=1.2,
                                  width=320, height=160)
    tv = wv @ np.array([*target, 1.0])
    # target straight ahead at the orbit radius
    np.testing.assert_allclose(tv[:3], [0, 0, 2.5], atol=1e-5)
    # camera center: wv @ [pos;1] = 0
    c2w = np.linalg.inv(wv)
    pos = c2w[:3, 3]
    assert np.linalg.norm(pos - target) == pytest.approx(2.5, abs=1e-5)
    # rotation orthonormal, y-down convention keeps world-up mapping to -y
    R = wv[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    # fovy from aspect: tan(fovy/2) = tan(fovx/2) * h/w
    assert np.tan(fovy / 2) == pytest.approx(np.tan(1.2 / 2) * 160 / 320)
    # clip: target projects to ndc (0, 0)
    clip = fp @ np.array([*target, 1.0])
    np.testing.assert_allclose(clip[:2] / clip[3], [0, 0], atol=1e-5)


def test_projection_depth_range():
    p = projection(0.01, 100.0, 1.2, 0.9)
    for z, expect in ((0.01, 0.0), (100.0, 1.0)):
        v = p @ np.array([0, 0, z, 1.0])
        assert v[2] / v[3] == pytest.approx(expect, abs=1e-6)


def test_look_at_pole_degeneracy():
    """Looking straight down the y axis must not produce NaNs."""
    wv = look_at([0.0, -5.0, 0.0], [0.0, 0.0, 0.0])
    assert np.all(np.isfinite(wv))
    np.testing.assert_allclose(wv[:3, :3] @ wv[:3, :3].T, np.eye(3),
                               atol=1e-6)


def _orbit_req(w=64, h=64, **kw):
    req = dict(yaw=0.3, pitch=0.25, radius=4.0, target=[0.0, 0.0, 0.0],
               fovx=1.3, width=w, height=h, scaling_modifier=1.0, train=True)
    req.update(kw)
    return req


def test_bridge_mode_end_to_end():
    """Browser POST -> WebViewer -> SIBR wire -> NetworkGUI server ->
    rendered bytes back, with the camera surviving the round trip."""
    from gsjax.ops.raster.camera import Camera

    port = _free_port()
    gui = NetworkGUI("127.0.0.1", port)
    seen = {}

    def serve():
        for _ in range(200):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.02)
        # answer exactly one request with a deterministic gradient frame
        cam_d, do_training, keep_alive, scaling = gui.receive()
        seen["cam"] = cam_d
        seen["scaling"] = scaling
        w, h = cam_d["width"], cam_d["height"]
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = np.arange(w, dtype=np.uint8)[None, :]
        img[..., 1] = np.arange(h, dtype=np.uint8)[:, None]
        gui.send(img, "gsjax-test")
        gui.disconnect()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    bridge = SIBRBridge("127.0.0.1", port)
    viewer = WebViewer(bridge, "127.0.0.1", 0).start()
    try:
        hport = viewer.httpd.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", hport, timeout=30)
        # the page itself
        conn.request("GET", "/")
        r = conn.getresponse()
        assert r.status == 200 and b"gsjax viewer" in r.read()
        # a frame
        req = _orbit_req(w=48, h=32, scaling_modifier=0.7)
        conn.request("POST", "/frame", body=json.dumps(req))
        r = conn.getresponse()
        assert r.status == 200
        assert (int(r.getheader("X-Width")),
                int(r.getheader("X-Height"))) == (48, 32)
        assert r.getheader("X-Verify") == "gsjax-test"
        rgb = np.frombuffer(r.read(), np.uint8).reshape(32, 48, 3)
        np.testing.assert_array_equal(rgb[0, :, 0], np.arange(48))
        np.testing.assert_array_equal(rgb[:, 0, 1], np.arange(32))
        t.join(timeout=10)
        # the trainer-side decode saw the orbit camera we asked for
        assert seen["scaling"] == pytest.approx(0.7)
        cam_d = seen["cam"]
        rebuilt = Camera.from_matrices(cam_d["width"], cam_d["height"],
                                       cam_d["fovx"], cam_d["fovy"],
                                       cam_d["world_view"],
                                       cam_d["full_proj"])
        wv, _, _ = orbit_matrices(req["yaw"], req["pitch"], req["radius"],
                                  req["target"], req["fovx"], 48, 32)
        pos = np.linalg.inv(wv)[:3, 3]
        np.testing.assert_allclose(np.asarray(rebuilt.campos), pos,
                                   atol=1e-4)
    finally:
        viewer.stop()
        bridge.close()


def test_local_mode_renders_model_dir(tmp_path):
    """LocalModel serves frames straight from a saved model directory."""
    from tests.test_train_step import make_model

    from gsjax.config import dump_cfg_args
    from gsjax.model.io import save_ply
    from argparse import Namespace

    params, aux = make_model(n=60, capacity=64, seed=3)
    mdir = str(tmp_path / "model")
    pdir = os.path.join(mdir, "point_cloud", "iteration_30")
    os.makedirs(pdir)
    save_ply(os.path.join(pdir, "point_cloud.ply"), params, aux)
    dump_cfg_args(mdir, Namespace(sh_degree=1, sg_degree=0, kernel_size=0.1,
                                  white_background=False))

    model = LocalModel(mdir)
    assert model.iteration == 30
    # resolution snaps to the tile grid
    assert LocalModel.snap(100, 70) == (96, 64)
    w, h, rgb, verify = model.frame(_orbit_req(w=100, h=70))
    assert (w, h) == (96, 64)
    img = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert img.size == 96 * 64 * 3
    # the random-gaussian cloud at the origin is visible from the orbit cam
    assert img.max() > 0
    # error path: malformed request surfaces as HTTP 500, not a hang
    viewer = WebViewer(model, "127.0.0.1", 0).start()
    try:
        hport = viewer.httpd.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", hport, timeout=30)
        conn.request("POST", "/frame", body=json.dumps(_orbit_req(w=96, h=64)))
        r = conn.getresponse()
        assert r.status == 200
        assert len(r.read()) == 96 * 64 * 3
        conn.request("POST", "/frame", body="{bad json")
        r = conn.getresponse()
        assert r.status == 500
        r.read()
    finally:
        viewer.stop()


def test_local_mode_overflow_growth_and_cfg_inference(tmp_path):
    """Undersized buffers grow on overflow instead of silently dropping
    splats, and a missing cfg_args infers sh/sg degree from the PLY."""
    import dataclasses

    from argparse import Namespace

    from tests.test_train_step import make_model

    from gsjax.config import dump_cfg_args
    from gsjax.model.io import save_ply

    params, aux = make_model(n=60, capacity=64, seed=3)
    mdir = str(tmp_path / "model")
    pdir = os.path.join(mdir, "point_cloud", "iteration_30")
    os.makedirs(pdir)
    save_ply(os.path.join(pdir, "point_cloud.ply"), params, aux)
    dump_cfg_args(mdir, Namespace(sh_degree=1, sg_degree=0, kernel_size=0.1,
                                  white_background=False))

    ref = LocalModel(mdir)
    w, h, rgb_ref, _ = ref.frame(_orbit_req(w=96, h=64))

    # force overflow: tiny initial buffers
    small = LocalModel(mdir)
    small.cfg = dataclasses.replace(small.cfg, pair_capacity=128,
                                    max_per_tile=8)
    w2, h2, rgb_small, _ = small.frame(_orbit_req(w=96, h=64))
    assert (w2, h2) == (w, h)
    assert small.cfg.pair_capacity > 128          # grew
    # no dropped splats: identical up to u8 rounding / depth-tie sort order
    a = np.frombuffer(rgb_small, np.uint8).astype(np.int16)
    b = np.frombuffer(rgb_ref, np.uint8).astype(np.int16)
    assert np.abs(a - b).max() <= 1

    # missing cfg_args: degrees inferred from the PLY (sh_degree=1 -> 3
    # rest coefficients), defaults warned about but usable
    bare = str(tmp_path / "bare")
    os.makedirs(os.path.join(bare, "point_cloud"))
    import shutil
    shutil.copytree(pdir, os.path.join(bare, "point_cloud", "iteration_30"))
    m2 = LocalModel(bare)
    assert m2.sh_degree == 1
    assert m2.sg_degree == params.sg_color.shape[1]
