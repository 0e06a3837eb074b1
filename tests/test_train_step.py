"""End-to-end training slice: overfit a synthetic scene, check PSNR rises."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.model import gaussians as gm
from gsjax.ops.knn import mean_knn_dist2
from gsjax.ops.raster import RasterConfig, render
from gsjax.train import losses
from gsjax.train.step import LossConfig, train_step
from tests.util import look_at_camera, random_gaussians


def make_cfg(**kw):
    d = dict(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
             max_per_tile=256, sh_degree=1, require_depth=False)
    d.update(kw)
    return RasterConfig(**d)


def render_params(params, aux, cam, cfg, bg):
    scales, opac = gm.scaling_n_opacity_with_3d_filter(params, aux.filter_3d)
    return render(params.xyz, scales, params.rotation, opac,
                  gm.get_features(params), cam, cfg, bg, alive=aux.alive)


def make_model(n=80, capacity=128, seed=0, sh_degree=1):
    means, scales, q, op, shs = random_gaussians(n, seed=seed)
    colors = np.clip(shs[:, 0] * 0.28 + 0.5, 0, 1)
    knn = mean_knn_dist2(means)
    params, aux = gm.init_from_pcd(means, colors, capacity, sh_degree, 0, knn)
    return params, aux


def test_overfit_improves_psnr():
    cam = look_at_camera(width=64, height=64)
    cfg = make_cfg()
    bg = jnp.zeros(3)

    # ground truth from a "true" scene
    means, scales, q, op, shs = random_gaussians(60, seed=7)
    gt = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                jnp.asarray(op), jnp.asarray(shs[:, :4]), cam,
                make_cfg(sh_degree=1), bg)["render"]

    params, aux = make_model(n=80, capacity=128, seed=1)
    adam = gm.adam_init(params)
    lcfg = LossConfig(reg_on=False)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.0, sg_sharpness=0.0, sg_color=0.0)

    img0 = render_params(params, aux, cam, cfg, bg)["render"]
    psnr0 = float(losses.psnr(jnp.clip(img0, 0, 1), gt))
    for i in range(60):
        params, aux, adam, metrics = train_step(
            params, aux, adam, cam, gt, bg, lrs, cfg, lcfg)
    img1 = render_params(params, aux, cam, cfg, bg)["render"]
    psnr1 = float(losses.psnr(jnp.clip(img1, 0, 1), gt))
    assert np.isfinite(float(metrics["loss"]))
    assert psnr1 > psnr0 + 2.0, f"psnr {psnr0:.2f} -> {psnr1:.2f}"


def test_densify_and_prune_roundtrip():
    params, aux = make_model(n=50, capacity=100)
    adam = gm.adam_init(params)
    # fake stats: half the points have large gradients
    aux = dataclasses.replace(
        aux,
        grad_accum=jnp.where(jnp.arange(100) % 2 == 0, 1.0, 0.0),
        grad_accum_abs=jnp.where(jnp.arange(100) % 2 == 0, 1.0, 0.0),
        denom=jnp.ones(100))
    p2, a2, ad2, stats = gm.densify_and_prune(
        params, aux, adam, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.05, extent=jnp.asarray(3.0))
    n0 = int(jnp.sum(aux.alive))
    n1 = int(stats["n_alive"])
    assert n1 >= n0  # clones/splits netted against prunes
    assert int(stats["n_split"]) > 0
    assert bool(jnp.all(a2.denom == 0))
    # all alive rotations stay normalisable
    norms = jnp.linalg.norm(p2.rotation, axis=-1)
    assert bool(jnp.all(jnp.where(a2.alive, norms > 1e-6, True)))


def test_reset_opacity():
    params, aux = make_model(n=30, capacity=40)
    adam = gm.adam_init(params)
    p2, ad2 = gm.reset_opacity(params, aux, adam)
    op = gm.get_opacity(p2)[jnp.asarray(aux.alive)]
    assert float(op.max()) <= 0.011
    assert float(jnp.abs(ad2.mu.opacity).max()) == 0.0


def test_grow_capacity():
    params, aux = make_model(n=30, capacity=40)
    adam = gm.adam_init(params)
    p2, a2, ad2 = gm.grow_capacity(params, aux, adam, 64)
    assert p2.capacity == 64
    assert int(jnp.sum(a2.alive)) == 30
    np.testing.assert_allclose(np.asarray(p2.xyz[:40]), np.asarray(params.xyz))


def test_depth_normal_grad_finite_on_flat_and_empty_depth():
    """Regression: depth_to_normal's normalisation must not emit NaN grads at
    zero cross-products (flat or empty depth regions) — the where() in
    depth_normal_loss does not mask NaN cotangent products."""
    import jax
    import jax.numpy as jnp

    from gsjax.train import losses

    depth = jnp.zeros((16, 16))
    depth = depth.at[4:12, 4:12].set(2.0)       # flat plateau + empty border

    def f(d):
        n, valid = losses.depth_to_normal(d, 20.0, 20.0, 8.0, 8.0)
        rn = jnp.ones((16, 16, 3)) / jnp.sqrt(3.0)
        return losses.depth_normal_loss(rn, n, valid)

    g = jax.grad(f)(depth)
    assert jnp.isfinite(g).all(), "NaN/inf in depth-normal gradient"
