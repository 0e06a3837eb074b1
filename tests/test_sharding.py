"""Sharded (8 virtual CPU devices) render/train parity with single-device.

The sharded step computes every loss term as a psum of per-device band
partial sums (gsjax/parallel/shard.py); these tests pin its losses, metrics,
parameter updates and densification statistics to the single-device
`train_step` within float tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.model import gaussians as gm
from gsjax.parallel import make_mesh, render_sharded, train_step_sharded
from gsjax.train.step import LossConfig, train_step
from tests.test_train_step import make_cfg, make_model, render_params
from tests.util import look_at_camera


def _setup(width=96, height=64, require_depth=True, n=60, seed=2):
    cam = look_at_camera(width=width, height=height)
    cfg = make_cfg(require_depth=require_depth)
    bg = jnp.zeros(3)
    params, aux = make_model(n=n, capacity=100, seed=seed)
    adam = gm.adam_init(params)
    gt = jnp.clip(render_params(params, aux, cam, cfg, bg)["render"] +
                  0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                          (height, width, 3)), 0, 1)
    lrs = dict(xyz=1.6e-4, features_dc=0.0025, features_rest=0.0001,
               opacity=0.05, scaling=0.005, rotation=0.001,
               sg_axis=0.0, sg_sharpness=0.0, sg_color=0.0)
    return cam, cfg, bg, params, aux, adam, gt, lrs


def test_render_sharded_matches_single():
    cam, cfg, bg, params, aux, *_ = _setup()
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


def test_render_views_sharded_matches_single():
    """Serving path: views data-parallel over the mesh equal per-view
    single-device renders; batch padding (3 views on 8 devices) is sliced
    away."""
    from gsjax.parallel import render_views_sharded

    from tests.util import look_at_camera

    _, cfg, bg, params, aux, *_ = _setup()
    mesh = make_mesh()
    cams = [look_at_camera(angle=a) for a in (0.0, 0.25, -0.4)]

    batched = render_views_sharded(params, aux, cams, cfg, bg, mesh)
    assert batched["render"].shape[0] == 3
    for i, cam in enumerate(cams):
        single = render_params(params, aux, cam, cfg, bg)
        np.testing.assert_allclose(np.asarray(batched["render"][i]),
                                   np.asarray(single["render"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batched["median_depth"][i]),
                                   np.asarray(single["median_depth"]),
                                   atol=1e-4)


def test_render_cli_view_parallel(tmp_path, monkeypatch):
    """render.py --n_devices 8 drives render_views_sharded end-to-end
    (model dir + cfg_args -> view-parallel render -> PNG tree)."""
    import os
    import sys
    from argparse import Namespace

    import render as render_cli
    from gsjax.config import dump_cfg_args
    from gsjax.model.io import save_ply
    from tests.test_data import write_synthetic_colmap
    from tests.test_train_step import make_model

    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=4, width=64, height=32)
    params, aux = make_model(n=60, capacity=64, seed=3)
    mdir = str(tmp_path / "model")
    pdir = os.path.join(mdir, "point_cloud", "iteration_5")
    os.makedirs(pdir)
    save_ply(os.path.join(pdir, "point_cloud.ply"), params, aux)
    from gsjax.config import ModelParams

    saved = Namespace(**ModelParams._defaults())
    saved.source_path, saved.model_path, saved.sh_degree = root, mdir, 1
    dump_cfg_args(mdir, saved)

    monkeypatch.setattr(sys, "argv", [
        "render.py", "-m", mdir, "--n_devices", "8",
        "--pair_capacity", str(1 << 14), "--skip_test"])
    render_cli.main()
    out = os.path.join(mdir, "train", "ours_5", "renders")
    assert sorted(os.listdir(out)) == [f"{i:05d}.png" for i in range(4)]


def test_train_step_sharded_matches_single_full():
    """Params, Adam state, densify stats and all loss metrics match the
    single-device step (reg on: banded L1 + SSIM + depth-normal)."""
    cam, cfg, bg, params, aux, adam, gt, lrs = _setup(require_depth=True)
    lc = LossConfig(reg_on=True)

    p1, aux1, adam1, m1 = train_step(params, aux, adam, cam, gt, bg, lrs,
                                     cfg, lc)
    mesh = make_mesh()
    p2, aux2, adam2, m2 = train_step_sharded(params, aux, adam, cam, gt, bg,
                                             lrs, cfg, lc, mesh)
    for k in ("loss", "l1", "ssim", "dn_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-4, atol=2e-5), k
    assert int(m2["num_pairs"]) == int(m1["num_pairs"])
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=1e-3, atol=2e-5)
    # densification statistics (psum'd mean2d gradient tap)
    np.testing.assert_allclose(np.asarray(aux2.grad_accum),
                               np.asarray(aux1.grad_accum),
                               rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(aux2.denom), np.asarray(aux1.denom))
    np.testing.assert_allclose(np.asarray(aux2.max_radii),
                               np.asarray(aux1.max_radii))


def test_train_step_sharded_multiview_matches_single():
    """Band-sharded PGSR terms over 8 devices == single-device metrics."""
    cam, cfg, bg, params, aux, adam, _, lrs = _setup(
        width=64, height=64, require_depth=True)
    near = look_at_camera(width=64, height=64, angle=0.12)
    gt = jnp.clip(render_params(params, aux, cam, cfg, bg)["render"], 0, 1)
    gray = jnp.mean(gt, axis=-1)
    lc = LossConfig(reg_on=True, mv_on=True)

    _, _, _, m1 = train_step(params, aux, adam, cam, gt, bg, lrs, cfg,
                             lc, near_cam=near, gray_r=gray, gray_n=gray)
    mesh = make_mesh()
    _, _, _, m2 = train_step_sharded(params, aux, adam, cam, gt, bg, lrs,
                                     cfg, lc, mesh, near_cam=near,
                                     gray_r=gray, gray_n=gray)
    for k in ("loss", "ncc_loss", "geo_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-4, atol=2e-5), k


def test_train_step_sharded_appearance_gof():
    """GOF appearance (CNN + embedding) grads under sharding match the
    single-device step; also exercises the gof train_step end-to-end."""
    from gsjax.model import appearance as app_lib

    cam, cfg, bg, params, aux, adam, gt, lrs = _setup(
        width=64, height=64, require_depth=False)
    app = app_lib.init_appearance("gof", 4, seed=0)
    lc = LossConfig(appearance="gof")
    emb = app.table[1]

    p1, _, _, m1 = train_step(params, aux, adam, cam, gt, bg, lrs, cfg, lc,
                              app_embedding=emb, app_net=app.net)
    mesh = make_mesh()
    p2, _, _, m2 = train_step_sharded(params, aux, adam, cam, gt, bg, lrs,
                                      cfg, lc, mesh, app_embedding=emb,
                                      app_net=app.net)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m2["app_grad"]),
                               np.asarray(m1["app_grad"]),
                               rtol=2e-3, atol=1e-6)
    for g1, g2 in zip(jax.tree_util.tree_leaves(m1["app_net_grad"]),
                      jax.tree_util.tree_leaves(m2["app_net_grad"])):
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=2e-3, atol=1e-6)
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=1e-3, atol=2e-5)


def test_sharded_training_with_densify_matches_single():
    """A short sharded training run with densify + opacity reset stays in
    lockstep with the single-device run (the dryrun_multichip protocol)."""
    cam, cfg, bg, params, aux, adam, gt, lrs = _setup(
        width=64, height=64, require_depth=False)
    lc = LossConfig()
    mesh = make_mesh()
    key = jax.random.PRNGKey(3)
    extent = jnp.asarray(4.0)

    s_params, s_aux, s_adam = params, aux, adam
    # commit the sharded branch's inputs to the mesh up front: the first
    # call's outputs are mesh-committed, so an uncommitted first call would
    # compile the step twice (~40 s each on this 1-core host)
    from jax.sharding import NamedSharding, PartitionSpec
    d_params, d_aux, d_adam, d_gt, d_bg = jax.device_put(
        (params, aux, adam, gt, bg), NamedSharding(mesh, PartitionSpec()))
    for it in range(1, 25):
        s_params, s_aux, s_adam, m1 = train_step(
            s_params, s_aux, s_adam, cam, gt, bg, lrs, cfg, lc)
        d_params, d_aux, d_adam, m2 = train_step_sharded(
            d_params, d_aux, d_adam, cam, d_gt, d_bg, lrs, cfg, lc, mesh)
        if it % 10 == 0:
            key, k = jax.random.split(key)
            s_params, s_aux, s_adam, _ = gm.densify_and_prune(
                s_params, s_aux, s_adam, k, 2e-4, 0.05, extent, 0.01)
            d_params, d_aux, d_adam, _ = gm.densify_and_prune(
                d_params, d_aux, d_adam, k, 2e-4, 0.05, extent, 0.01)
        if it == 15:
            s_params, s_adam = gm.reset_opacity(s_params, s_aux, s_adam)
            d_params, d_adam = gm.reset_opacity(d_params, d_aux, d_adam)
    assert int(jnp.sum(s_aux.alive)) == int(jnp.sum(d_aux.alive))
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_params.xyz),
                               np.asarray(s_params.xyz),
                               rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_run_training_sharded_cli_path(tmp_path):
    """run_training with n_devices=8 drives the sharded step end-to-end
    (scene load -> mesh -> densify schedule -> save), the CLI seam above
    the step-level parity tests."""
    import os
    from argparse import Namespace

    from gsjax.config import ModelParams, OptimizationParams
    from gsjax.train.loop import run_training
    from tests.test_data import write_synthetic_colmap

    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=4, width=64, height=32)
    lp = Namespace(**ModelParams._defaults())
    lp.source_path = root
    lp.model_path = str(tmp_path / "out")
    lp.sh_degree = 1
    o = Namespace(**OptimizationParams._defaults())
    o.iterations = 8
    o.densify_from_iter = 2
    o.densify_until_iter = 7
    o.densification_interval = 3
    o.opacity_reset_interval = 1000
    o.regularization_from_iter = 10_000
    args = Namespace(test_iterations=[], save_iterations=[8],
                     checkpoint_iterations=[], start_checkpoint=None,
                     n_devices=8)
    trainer = run_training(lp, o, None, args)
    assert trainer.sharded and trainer.mesh.devices.size == 8
    assert trainer.iteration == 8
    assert os.path.exists(os.path.join(
        lp.model_path, "point_cloud", "iteration_8", "point_cloud.ply"))


def test_balance_band_bounds_properties():
    """Host band chooser: coverage, monotonicity, the rows_per_max cap, and
    a real balance win on centrally-clustered histograms."""
    from gsjax.parallel import balance_band_bounds, equal_band_bounds

    rng = np.random.default_rng(0)
    for tiles_y, n, rpm in ((17, 8, 4), (64, 8, 16), (5, 8, 1), (40, 4, 20),
                            (8, 8, 2)):
        for _ in range(5):
            hist = rng.integers(0, 1000, tiles_y).astype(np.float64)
            b = balance_band_bounds(hist, n, rpm)
            assert b[0] == 0 and b[-1] == tiles_y
            assert np.all(np.diff(b) >= 0)
            assert np.all(np.diff(b) <= rpm)

    # heavy central clustering: balanced max-band pair share must clearly
    # beat equal rows (which puts ~all pairs on the central devices)
    tiles_y, n, rpm = 64, 8, 16
    hist = 1000.0 * np.exp(-0.5 * ((np.arange(tiles_y) - 32) / 4.0) ** 2)
    b = balance_band_bounds(hist, n, rpm)

    def max_share(bounds):
        return max(hist[bounds[d]:bounds[d + 1]].sum()
                   for d in range(n)) / hist.sum()

    # ideal balance is 1/n + one boundary row (~0.22 here); 0.6x equal-rows
    # leaves slack for the quantile boundary rounding
    assert max_share(b) < 0.6 * max_share(equal_band_bounds(tiles_y, n))


def test_sharded_step_custom_bounds_parity():
    """An arbitrary valid non-equal band partition (including empty bands)
    yields the same step as single-device: the partition only moves work."""
    cam, cfg, bg, params, aux, adam, gt, lrs = _setup(
        width=64, height=256, require_depth=True)
    lc = LossConfig(reg_on=True)

    p1, aux1, adam1, m1 = train_step(params, aux, adam, cam, gt, bg, lrs,
                                     cfg, lc)
    mesh = make_mesh()
    # tiles_y = 8 (tile=32): widths 2,1,0,1,1,1,1,1 — skewed + one empty band
    bounds = np.array([0, 2, 3, 3, 4, 5, 6, 7, 8], np.int32)
    p2, aux2, adam2, m2 = train_step_sharded(
        params, aux, adam, cam, gt, bg, lrs, cfg, lc, mesh,
        row_bounds=bounds, rows_per_max=2)
    for k in ("loss", "l1", "ssim", "dn_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-4, atol=2e-5), k
    assert int(m2["num_pairs"]) == int(m1["num_pairs"])
    # the psum'd per-row histogram must account for every LIVE (post-cull)
    # pair exactly (num_pairs counts the pre-cull enumeration)
    assert int(np.asarray(m2["row_pairs"]).sum()) == int(m1["num_live_pairs"])
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux2.grad_accum),
                               np.asarray(aux1.grad_accum),
                               rtol=2e-3, atol=1e-7)

    single = render_params(params, aux, cam, cfg, bg)
    sharded = render_sharded(params, aux, cam, cfg, bg, mesh,
                             row_bounds=bounds, rows_per_max=2)
    np.testing.assert_allclose(np.asarray(sharded["color"]),
                               np.asarray(single["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["median_depth"]),
                               np.asarray(single["median_depth"]), atol=1e-4)


def test_sharded_step_dual_bands_parity():
    """Mirrored dual-band partition ([2n+1] bounds: device d owns bands d
    and 2n-1-d) yields the same step as single-device."""
    cam, cfg, bg, params, aux, adam, gt, lrs = _setup(
        width=64, height=256, require_depth=True)
    lc = LossConfig(reg_on=True)

    p1, aux1, adam1, m1 = train_step(params, aux, adam, cam, gt, bg, lrs,
                                     cfg, lc)
    mesh = make_mesh()
    n = mesh.devices.size
    assert n == 8
    # tiles_y = 8: 16 bands of width 0/1, scattered empties; device d owns
    # bands d and 15-d
    bounds = np.array([0, 1, 1, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 8],
                      np.int32)
    p2, aux2, adam2, m2 = train_step_sharded(
        params, aux, adam, cam, gt, bg, lrs, cfg, lc, mesh,
        row_bounds=bounds, rows_per_max=2)
    for k in ("loss", "l1", "ssim", "dn_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-4, atol=2e-5), k
    assert int(m2["num_pairs"]) == int(m1["num_pairs"])
    assert int(np.asarray(m2["row_pairs"]).sum()) == int(m1["num_live_pairs"])
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=1e-3, atol=2e-5)


def test_sharded_step_paired_bands_parity():
    """FREE band matching ([2n+1] bounds + band_pair [n,2], round 5): a
    non-mirrored heavy-with-light assignment yields the same step as
    single-device — the matching only moves work between devices."""
    cam, cfg, bg, params, aux, adam, gt, lrs = _setup(
        width=64, height=256, require_depth=True)
    lc = LossConfig(reg_on=True)

    p1, aux1, adam1, m1 = train_step(params, aux, adam, cam, gt, bg, lrs,
                                     cfg, lc)
    mesh = make_mesh()
    n = mesh.devices.size
    assert n == 8
    # tiles_y = 8: 16 bands of width 0/1 with scattered empties; a
    # deliberately non-mirrored matching (each pair (a, b) with a < b)
    bounds = np.array([0, 1, 1, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 8],
                      np.int32)
    pair = np.array([[0, 3], [1, 15], [2, 8], [4, 11],
                     [5, 9], [6, 14], [7, 12], [10, 13]], np.int32)
    assert sorted(pair.reshape(-1).tolist()) == list(range(16))
    p2, aux2, adam2, m2 = train_step_sharded(
        params, aux, adam, cam, gt, bg, lrs, cfg, lc, mesh,
        row_bounds=bounds, rows_per_max=2, band_pair=pair)
    for k in ("loss", "l1", "ssim", "dn_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-4, atol=2e-5), k
    assert int(m2["num_pairs"]) == int(m1["num_pairs"])
    assert int(np.asarray(m2["row_pairs"]).sum()) == int(m1["num_live_pairs"])
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=1e-3, atol=2e-5)


def test_paired_balance_bounds_properties():
    """paired_balance_bounds: coverage, pair disjointness/order, the
    rows_per_max device cap, and a matching win over the mirrored pairing
    on a centre-heavy histogram (where mirrored couples the two heaviest
    central bands)."""
    from gsjax.parallel import dual_balance_bounds, paired_balance_bounds

    rng = np.random.default_rng(1)
    for tiles_y, n in ((34, 16), (34, 8), (64, 8), (17, 8)):
        rpm = min(tiles_y, -(-tiles_y // n) * 2)
        for hist in (rng.integers(0, 1000, tiles_y).astype(np.float64),
                     1000.0 * np.exp(-0.5 * (
                         (np.arange(tiles_y) - tiles_y / 2) / 5.0) ** 2)):
            b, pr = paired_balance_bounds(hist, n, rpm)
            assert b[0] == 0 and b[-1] == tiles_y
            assert np.all(np.diff(b) >= 0)
            assert sorted(pr.reshape(-1).tolist()) == list(range(2 * n))
            assert np.all(pr[:, 0] < pr[:, 1])
            rows = b[1:] - b[:-1]
            assert np.all(rows[pr[:, 0]] + rows[pr[:, 1]] <= rpm)

    # centre-heavy: free matching must beat the mirrored pairing
    tiles_y, n = 34, 16
    rpm = min(tiles_y, -(-tiles_y // n) * 2)
    hist = 1000.0 * np.exp(-0.5 * ((np.arange(tiles_y) - 17) / 8.0) ** 2)
    cum = np.concatenate([[0.0], np.cumsum(hist)])
    b2 = dual_balance_bounds(hist, n, max(rpm // 2, 1))
    s2 = max(cum[b2[d + 1]] - cum[b2[d]] +
             cum[b2[2 * n - d]] - cum[b2[2 * n - 1 - d]] for d in range(n))
    b3, p3 = paired_balance_bounds(hist, n, rpm)
    s3 = max(cum[b3[p3[d, 0] + 1]] - cum[b3[p3[d, 0]]] +
             cum[b3[p3[d, 1] + 1]] - cum[b3[p3[d, 1]]] for d in range(n))
    assert s3 < s2


def test_trainer_band_kwargs_unit():
    """Host-side band bookkeeping: equal bounds before any histogram,
    per-view exact histograms, scene-EMA fallback, kill-switch."""
    from types import SimpleNamespace

    from gsjax.ops.raster.config import RasterConfig
    from gsjax.train.loop import Trainer

    t = Trainer(scene=None, params=None, aux=None, adam=None, app=None,
                opt=None, model_path="")
    t.mesh = SimpleNamespace(devices=SimpleNamespace(size=8))
    t.band_balance = True
    cfg = RasterConfig()
    cam = SimpleNamespace(width=2 * cfg.tile, height=64 * cfg.tile)

    kw = t.band_kwargs(cam, cfg, uid=3)          # no histogram -> equal rows
    b0 = np.asarray(kw["row_bounds"])
    assert b0[0] == 0 and b0[-1] == 64 and np.all(np.diff(b0) >= 0)

    hist = np.zeros(64)
    hist[30:34] = 100.0                          # central cluster
    t.note_row_pairs({"row_pairs": hist}, uid=3)
    kw2 = t.band_kwargs(cam, cfg, uid=3)
    b = np.asarray(kw2["row_bounds"])
    assert not np.array_equal(b, b0)
    assert np.all(np.diff(b) <= kw2["rows_per_max"])
    assert b[0] == 0 and b[-1] == 64

    # unseen uid falls back to the scene EMA (same single histogram here)
    assert np.array_equal(
        np.asarray(t.band_kwargs(cam, cfg, uid=99)["row_bounds"]), b)

    t.band_balance = False
    assert t.band_kwargs(cam, cfg, uid=3) == {}
