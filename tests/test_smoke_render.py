import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops.raster import RasterConfig, render
from tests.util import look_at_camera, random_gaussians


def small_cfg(**kw):
    defaults = dict(tile=32, chunk=32, tile_batch=4, pair_capacity=1 << 13,
                    max_per_tile=256, sh_degree=2, require_depth=True)
    defaults.update(kw)
    return RasterConfig(**defaults)


def test_forward_shapes_and_ranges():
    means, scales, q, op, shs = random_gaussians(200)
    cam = look_at_camera()
    cfg = small_cfg()
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(op), jnp.asarray(shs), cam, cfg,
                 jnp.zeros(3))
    img = np.asarray(out["render"])
    assert img.shape == (64, 96, 3)
    assert np.isfinite(img).all()
    alpha = np.asarray(out["alpha"])
    assert (alpha >= 0).all() and (alpha <= 1 + 1e-5).all()
    assert alpha.max() > 0.5  # something rendered
    normal = np.asarray(out["normal"])
    assert np.isfinite(normal).all()
    depth = np.asarray(out["median_depth"])
    assert np.isfinite(depth).all()
    assert depth.max() > 0.5  # plausible depths where opaque
    assert int(out["num_pairs"]) > 0
    assert int(out["max_tile_count"]) <= cfg.max_per_tile


def test_backward_finite():
    means, scales, q, op, shs = random_gaussians(100)
    cam = look_at_camera(width=64, height=32)
    cfg = small_cfg()

    def loss(m, s, qq, o, c):
        out = render(m, s, qq, o, c, cam, cfg, jnp.zeros(3))
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["median_depth"]) * 1e-3

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(op), jnp.asarray(shs))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert any(float(jnp.abs(g).max()) > 0 for g in grads)


def test_mark_visible_frustum():
    """mark_visible = view-space z > near (markVisible,
    rasterizer_impl.cu:214-233)."""
    import numpy as np

    from gsjax.ops.raster import mark_visible
    from tests.util import look_at_camera

    cam = look_at_camera(width=32, height=32)
    wv = np.asarray(cam.world_view)
    c2w = np.linalg.inv(wv)
    ahead = c2w[:3, 3] + c2w[:3, 2] * 2.0     # 2 units along view dir
    behind = c2w[:3, 3] - c2w[:3, 2] * 2.0
    at_cam = c2w[:3, 3]
    pts = jnp.asarray(np.stack([ahead, behind, at_cam]).astype(np.float32))
    vis = np.asarray(mark_visible(pts, cam))
    assert vis.tolist() == [True, False, False]


def test_ellipse_trajectory_points_at_scene():
    """generate_path cameras look toward the scene focus and keep a sane
    distance (render_utils.py:127-201 equivalent)."""
    import numpy as np

    from gsjax.ops.raster.camera import Camera
    from gsjax.utils.trajectories import generate_path
    from tests.scene_gen import ring_pose

    cams = [Camera.create(*_rt(ring_pose(i, 8)), 0.9, 0.7, 64, 48)
            for i in range(8)]
    traj = generate_path(cams, n_frames=12)
    assert len(traj) == 12
    for c in traj:
        assert c.width == 64 and c.height == 48
        wv = np.asarray(c.world_view)
        # orthonormal rotation, finite position
        np.testing.assert_allclose(wv[:3, :3] @ wv[:3, :3].T, np.eye(3),
                                   atol=1e-5)
        pos = np.linalg.inv(wv)[:3, 3]
        assert np.isfinite(pos).all() and np.linalg.norm(pos) < 50


def _rt(pose):
    r_w2c, tvec = pose
    return r_w2c.T, tvec
