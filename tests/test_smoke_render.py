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
