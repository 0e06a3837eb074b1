"""Sharded (8 virtual CPU devices) render/train parity with single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.model import gaussians as gm
from gsjax.ops.raster import RasterConfig, render
from gsjax.parallel import make_mesh, render_sharded, train_step_sharded
from gsjax.train.step import LossConfig
from tests.test_train_step import make_cfg, make_model, render_params
from tests.util import look_at_camera


def test_render_sharded_matches_single():
    cam = look_at_camera(width=96, height=64)
    cfg = make_cfg(require_depth=True)
    bg = jnp.zeros(3)
    params, aux = make_model(n=60, capacity=100, seed=2)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    single = render_params(params, aux, cam, cfg, bg)
    sharded = render_sharded(params, aux, cam, cfg, bg, mesh)
    np.testing.assert_allclose(np.asarray(sharded["color"]),
                               np.asarray(single["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["alpha"]),
                               np.asarray(single["alpha"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["median_depth"]),
                               np.asarray(single["median_depth"]), atol=1e-4)


def test_train_step_sharded_runs():
    cam = look_at_camera(width=64, height=64)
    cfg = make_cfg(require_depth=False)
    bg = jnp.zeros(3)
    params, aux = make_model(n=60, capacity=100, seed=2)
    adam = gm.adam_init(params)
    gt = jnp.clip(render_params(params, aux, cam, cfg, bg)["render"] +
                  0.1 * jax.random.normal(jax.random.PRNGKey(0), (64, 64, 3)), 0, 1)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.0, sg_sharpness=0.0, sg_color=0.0)
    mesh = make_mesh()
    p2, adam2, loss = train_step_sharded(params, aux, adam, cam, gt, bg, lrs,
                                         cfg, LossConfig(), mesh)
    assert np.isfinite(float(loss))
    # parameters actually moved
    assert float(jnp.abs(p2.xyz - params.xyz).max()) > 0
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_step_sharded_multiview_matches_single():
    """Band-sharded PGSR terms over 8 devices == single-device loss."""
    from gsjax.train.step import train_step

    cam = look_at_camera(width=64, height=64)
    near = look_at_camera(width=64, height=64, angle=0.12)
    cfg = make_cfg(require_depth=True)
    bg = jnp.zeros(3)
    params, aux = make_model(n=60, capacity=100, seed=2)
    adam = gm.adam_init(params)
    gt = jnp.clip(render_params(params, aux, cam, cfg, bg)["render"], 0, 1)
    gray = jnp.mean(gt, axis=-1)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.0, sg_sharpness=0.0, sg_color=0.0)
    lc = LossConfig(reg_on=True, mv_on=True)

    _, _, _, metrics = train_step(params, aux, adam, cam, gt, bg, lrs, cfg,
                                  lc, near_cam=near, gray_r=gray, gray_n=gray)
    mesh = make_mesh()
    _, _, loss_sh = train_step_sharded(params, aux, adam, cam, gt, bg, lrs,
                                       cfg, lc, mesh, near_cam=near,
                                       gray_r=gray, gray_n=gray)
    np.testing.assert_allclose(float(loss_sh), float(metrics["loss"]),
                               rtol=2e-4, atol=2e-5)
