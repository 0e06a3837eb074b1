"""Tests for sample_depth / integrate / NCC ops."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops.ncc import warp_patch_ncc
from gsjax.ops.raster import RasterConfig, render
from gsjax.ops.sample import integrate, sample_depth
from tests.util import look_at_camera, random_gaussians


def scene_and_render(width=96, height=64, n=120, seed=3):
    means, scales, q, op, shs = random_gaussians(n, seed=seed)
    cam = look_at_camera(width=width, height=height)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=1, require_depth=True)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(op), jnp.asarray(shs[:, :4]))
    out = render(*args, cam, cfg, jnp.zeros(3))
    return args, cam, cfg, out


def test_sample_depth_self_consistency():
    (means, scales, q, op, shs), cam, cfg, out = scene_and_render()
    depth = np.asarray(out["median_depth"])
    h, w = depth.shape
    xs = (np.arange(w) - (w - 1) / 2) / float(cam.fx)
    ys = (np.arange(h) - (h - 1) / 2) / float(cam.fy)
    pts = np.stack([depth * xs[None, :], depth * ys[:, None], depth], -1)
    pts = pts.reshape(-1, 3)  # identity camera: cam frame == world frame
    sel = depth.reshape(-1) > 0.5
    pts = pts[sel][::7]

    res = sample_depth(jnp.asarray(pts.astype(np.float32)), means, scales, q, op,
                       cam, cfg, point_batch=256)
    sd = np.asarray(res["sampled_depth"])
    inside = np.asarray(res["inside"])
    assert inside.mean() > 0.8
    ref = pts[:, 2]
    err = np.abs(sd[inside] - ref[inside]) / ref[inside]
    assert np.median(err) < 2e-3, f"median rel err {np.median(err)}"


def test_sample_depth_grads_flow_to_points_and_gaussians():
    (means, scales, q, op, shs), cam, cfg, out = scene_and_render(n=120)
    # pick 2 surface points from the rendered depth (guaranteed in_range)
    depth = np.asarray(out["median_depth"])
    ys, xs = np.nonzero(depth > 1.0)
    pick = [len(ys) // 3, 2 * len(ys) // 3]
    pw = []
    for i in pick:
        y, x = ys[i], xs[i]
        d = depth[y, x]
        pw.append([(x - (96 - 1) / 2) / float(cam.fx) * d,
                   (y - (64 - 1) / 2) / float(cam.fy) * d, d])
    pts = jnp.asarray(np.array(pw, np.float32))

    def loss(p, m):
        r = sample_depth(p, m, scales, q, op, cam, cfg, point_batch=2)
        return jnp.sum(jnp.where(r["inside"], r["sampled_depth"], 0.0))

    gp, gm_ = jax.grad(loss, argnums=(0, 1))(pts, means)
    assert np.isfinite(np.asarray(gp)).all()
    assert np.isfinite(np.asarray(gm_)).all()
    assert float(jnp.abs(gm_).max()) > 0


def test_integrate_transmittance_monotone():
    (means, scales, q, op, shs), cam, cfg, out = scene_and_render()
    # points along the central pixel ray, front to back
    zs = np.linspace(0.5, 8.0, 12).astype(np.float32)
    pts = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], -1)
    res = integrate(jnp.asarray(pts), means, scales, q, op, cam, cfg,
                    point_batch=16)
    t = np.asarray(res["transmittance"])
    assert np.all(np.asarray(res["inside"]))
    assert np.all(t >= -1e-5) and np.all(t <= 1 + 1e-5)
    # transmittance decreases (non-strictly) with depth
    assert np.all(np.diff(t) < 1e-3)
    assert t[0] > 0.97          # nothing in front of 0.5
    # behind everything, integrated alpha approaches the blended pixel alpha
    # (the query projects to the fractional pixel (47.5, 31.5), so compare
    # loosely against the nearest pixel)
    alpha_img = float(np.asarray(out["alpha"])[32, 48])
    assert abs((1 - t[-1]) - alpha_img) < 0.25


def test_ncc_identity_is_one():
    rng = np.random.default_rng(0)
    gray = rng.random((48, 64)).astype(np.float32)
    depth = jnp.full((48, 64), 2.0)
    normal = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (48, 64, 1))
    intr = (50.0, 50.0, 31.5, 23.5)
    ncc, valid = warp_patch_ncc(depth, normal, jnp.asarray(gray),
                                jnp.asarray(gray), jnp.eye(3), jnp.zeros(3),
                                intr, intr)
    v = np.asarray(valid)
    assert v.sum() > 500
    np.testing.assert_allclose(np.asarray(ncc)[v], 1.0, atol=1e-3)


def test_ncc_differentiable():
    rng = np.random.default_rng(0)
    gray_r = rng.random((32, 40)).astype(np.float32)
    gray_n = rng.random((32, 40)).astype(np.float32)
    intr = (40.0, 40.0, 19.5, 15.5)

    def loss(depth, normal):
        ncc, valid = warp_patch_ncc(depth, normal, jnp.asarray(gray_r),
                                    jnp.asarray(gray_n), jnp.eye(3),
                                    jnp.asarray([0.1, 0.0, 0.0]), intr, intr)
        return jnp.sum(jnp.where(valid, 1 - ncc, 0.0))

    d = jnp.full((32, 40), 2.0)
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (32, 40, 1))
    gd, gn = jax.grad(loss, argnums=(0, 1))(d, nrm)
    assert np.isfinite(np.asarray(gd)).all()
    assert np.isfinite(np.asarray(gn)).all()
    assert float(jnp.abs(gd).max()) > 0


def _pallas_ref_pair(n=150, seed=7):
    """Scene + query points with both backend configs."""
    means, scales, q, op, _ = random_gaussians(n, seed=seed)
    cam = look_at_camera(width=96, height=64)
    cfg_ref = RasterConfig(tile=32, chunk=32, tile_batch=2,
                           pair_capacity=1 << 13, max_per_tile=256,
                           require_depth=True, backend="ref")
    cfg_pal = dataclasses.replace(cfg_ref, backend="pallas")
    rng = np.random.default_rng(seed)
    qn = 180
    depth = rng.uniform(2.0, 6.0, qn).astype(np.float32)
    xs = rng.uniform(-0.45, 0.45, qn)
    ys = rng.uniform(-0.35, 0.35, qn)
    pts = np.stack([xs * depth, ys * depth, depth], -1).astype(np.float32)
    args = (jnp.asarray(pts), jnp.asarray(means), jnp.asarray(scales),
            jnp.asarray(q), jnp.asarray(op))
    return args, cam, cfg_ref, cfg_pal


def test_sample_depth_pallas_matches_ref():
    """Interpret-mode Pallas point kernel vs the XLA round path."""
    args, cam, cfg_ref, cfg_pal = _pallas_ref_pair()
    r1 = sample_depth(*args, cam, cfg_ref)
    r2 = sample_depth(*args, cam, cfg_pal)
    in1 = np.asarray(r1["inside"])
    assert (in1 == np.asarray(r2["inside"])).all()
    d1 = np.asarray(r1["sampled_depth"])[in1]
    d2 = np.asarray(r2["sampled_depth"])[in1]
    assert in1.sum() > 30
    np.testing.assert_allclose(d1, d2, atol=2e-5, rtol=1e-5)


def test_integrate_pallas_matches_ref():
    args, cam, cfg_ref, cfg_pal = _pallas_ref_pair(seed=11)
    i1 = integrate(*args, cam, cfg_ref)
    i2 = integrate(*args, cam, cfg_pal)
    np.testing.assert_allclose(np.asarray(i1["alpha"]),
                               np.asarray(i2["alpha"]), atol=5e-4)


def test_sample_depth_pallas_grads_match_ref():
    """Hand-written implicit-function VJP vs autodiff-through-bisection.

    The two differ by the bisection's finite resolution (~1e-2 relative
    typically, a few % for points near in_range/bracket kinks where finite
    differences do not even converge; the implicit derivative is the more
    accurate one — see render_pallas docstring)."""
    args, cam, cfg_ref, cfg_pal = _pallas_ref_pair(seed=13)
    w = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, args[0].shape[0]).astype(np.float32))

    def loss(cfg, p, m, s, q_, o):
        r = sample_depth(p, m, s, q_, o, cam, cfg)
        return jnp.sum(jnp.where(r["inside"], r["sampled_depth"] * w, 0.0))

    g_ref = jax.grad(lambda *a: loss(cfg_ref, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss(cfg_pal, *a), argnums=(0, 1, 2, 3, 4))(*args)
    for gr, gp in zip(g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert np.isfinite(gp).all()
        scale = np.abs(gr).max() + 1e-12
        assert np.abs(gr - gp).max() / scale < 8e-2


def test_evaluate_sdf_sign_and_surface():
    """evaluate_sdf = median ray depth - point ray depth: ~0 on the rendered
    median surface, positive in front of it, negative behind (the
    evaluateSDFCUDA contract, sample_forward.cu:171-428)."""
    from gsjax.ops.sample import evaluate_sdf

    (means, scales, q, op, shs), cam, cfg, out = scene_and_render()
    depth = np.asarray(out["median_depth"])
    h, w = depth.shape
    xs = (np.arange(w) - (w - 1) / 2) / float(cam.fx)
    ys = (np.arange(h) - (h - 1) / 2) / float(cam.fy)
    pts = np.stack([depth * xs[None, :], depth * ys[:, None], depth], -1)
    pts = pts.reshape(-1, 3)[depth.reshape(-1) > 0.5][::11]
    pts = pts.astype(np.float32)

    on = evaluate_sdf(jnp.asarray(pts), means, scales, q, op, cam, cfg,
                      point_batch=256)
    inside = np.asarray(on["inside"])
    assert inside.mean() > 0.8
    ray_t = np.linalg.norm(pts, axis=1)          # identity cam: t = |p|
    sdf_on = np.asarray(on["sdf"])[inside]
    rel = np.abs(sdf_on) / ray_t[inside]
    assert np.median(rel) < 2e-3, f"median |sdf|/t on surface: {np.median(rel)}"

    front = evaluate_sdf(jnp.asarray(pts * 0.8), means, scales, q, op, cam,
                         cfg, point_batch=256)
    fin = np.asarray(front["inside"])
    assert (np.asarray(front["sdf"])[fin] > 0).mean() > 0.95

    behind = evaluate_sdf(jnp.asarray(pts * 1.2), means, scales, q, op, cam,
                          cfg, point_batch=256)
    bin_ = np.asarray(behind["inside"])
    assert (np.asarray(behind["sdf"])[bin_] < 0).mean() > 0.95
