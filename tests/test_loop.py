"""End-to-end mini training run through the full CLI driver machinery."""

import os
from argparse import Namespace

import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.model import appearance as app_lib
from gsjax.model import gaussians as gm
from gsjax.model.io import load_ply, save_ply
from gsjax.train.loop import Trainer, run_training
from tests.test_data import write_synthetic_colmap
from tests.test_train_step import make_model


def small_opt(iterations=24):
    from gsjax.config import OptimizationParams
    o = Namespace(**OptimizationParams._defaults())
    o.iterations = iterations
    o.densify_from_iter = 5
    o.densify_until_iter = 20
    o.densification_interval = 10
    o.opacity_reset_interval = 1000
    o.regularization_from_iter = 10_000   # keep geometry path off for speed
    return o


@pytest.mark.slow
def test_run_training_end_to_end(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=5, width=64, height=32)

    from gsjax.config import ModelParams
    lp = Namespace(**ModelParams._defaults())
    lp.source_path = root
    lp.model_path = str(tmp_path / "out")
    lp.eval = False
    lp.sh_degree = 1
    args = Namespace(test_iterations=[], save_iterations=[24],
                     checkpoint_iterations=[24], start_checkpoint=None)
    trainer = run_training(lp, small_opt(), None, args)
    assert trainer.iteration == 24
    ply = os.path.join(lp.model_path, "point_cloud", "iteration_24", "point_cloud.ply")
    assert os.path.exists(ply)
    p2, a2 = load_ply(ply)
    assert int(jnp.sum(a2.alive)) == int(jnp.sum(trainer.aux.alive))
    assert os.path.exists(os.path.join(lp.model_path, "chkpnt24.npz"))
    assert os.path.exists(os.path.join(lp.model_path, "multi_view.json"))


def test_model_ply_roundtrip(tmp_path):
    params, aux = make_model(n=40, capacity=64)
    path = str(tmp_path / "pc.ply")
    save_ply(path, params, aux)
    p2, a2 = load_ply(path)
    alive = np.asarray(aux.alive)
    np.testing.assert_allclose(np.asarray(p2.xyz)[:40],
                               np.asarray(params.xyz)[alive], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.features_rest)[:40],
                               np.asarray(params.features_rest)[alive], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.rotation)[:40],
                               np.asarray(params.rotation)[alive], atol=1e-6)


def test_gof_appearance_forward():
    import jax
    net = app_lib.init_gof_net(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 67, 4, 5))
    y = app_lib.gof_forward(net, x)
    assert y.shape == (1, 3, 128, 160)
    assert float(y.min()) >= 0 and float(y.max()) <= 1

    img = jax.random.uniform(jax.random.PRNGKey(2), (70, 65, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(3), (70, 65, 3))
    emb = jnp.zeros(64)
    val = app_lib.l1_appearance_gof(img, gt, net, emb)
    assert np.isfinite(float(val))


def test_update_table_moves_only_selected_row_strongly():
    app = app_lib.init_appearance("pgsr", 4)
    g = jnp.ones(2)
    app2 = app_lib.update_table(app, 2, g, 0.01)
    delta = np.abs(np.asarray(app2.table) - np.asarray(app.table)).sum(axis=1)
    assert delta[2] > 0 and delta[0] == 0


@pytest.mark.slow
def test_multiview_losses_fire_on_consistent_scene():
    """On a photometrically consistent scene the PGSR multi-view NCC/geo
    losses must engage (nonzero, finite grads) — guards against
    silently-empty masks (train.py:182-191). Evaluated directly at the
    generating gaussians (a cold model needs ~400 iters to reach alpha>0.55;
    trainer-level engagement was verified on TPU: 301/301 reg iterations
    nonzero after convergence)."""
    import jax
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig, render
    from gsjax.ops.raster.camera import Camera
    from gsjax.train.multiview import patchmatch_losses
    from tests.scene_gen import arc_pose, make_gaussians

    w, h = 64, 32
    n_img = 4
    means, scales, quats, opac, shs = make_gaussians(120, seed=0)
    fx = 0.9 * w
    fovx = 2 * np.arctan(w / (2 * fx))
    fovy = 2 * np.arctan(h / (2 * fx))
    cams, grays = [], []
    cfg = RasterConfig(pair_capacity=1 << 14, max_per_tile=1 << 9,
                       sh_degree=0, require_depth=True)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    for i in range(n_img):
        r_w2c, tvec = arc_pose(i, n_img)
        cam = Camera.create(r_w2c.T, tvec, fovx, fovy, w, h)
        cams.append(cam)
        img = render(*args, cam, cfg, jnp.zeros(3))["render"]
        grays.append(jnp.clip(img, 0, 1).mean(-1))

    ref_i, near_i = 1, 2
    alive = jnp.ones((means.shape[0],), bool)

    def loss_fn(ms, sc, qt, op):
        out = render(ms, sc, qt, op, args[4], cams[ref_i], cfg, jnp.zeros(3))
        ncc, geo, _wr, _nq, _nb = patchmatch_losses(
            out["median_depth"], out["normal"], ms, sc, qt, op, alive,
            cams[ref_i], cams[near_i], grays[ref_i], grays[near_i], cfg)
        return ncc + geo, (ncc, geo)

    (_, (ncc, geo)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(*args[:4])
    assert float(ncc) > 1e-6, "NCC loss empty on a consistent scene"
    assert float(geo) > 1e-6, "geometric loss empty on a consistent scene"
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_multiview_query_compaction_parity():
    """Compacted sample_depth queries (query_capacity) must reproduce the
    dense losses and gradients exactly: the pre-mask (depth>0 & in-frustum)
    is a superset of d_mask, so no contributing pixel is dropped. Also
    checks the n_queries watermark and overflow behaviour (tiny capacity
    truncates without NaNs)."""
    import jax
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig, render
    from gsjax.ops.raster.camera import Camera
    from gsjax.train.multiview import patchmatch_losses
    from tests.scene_gen import arc_pose, make_gaussians

    w, h = 64, 32
    means, scales, quats, opac, shs = make_gaussians(120, seed=0)
    fx = 0.9 * w
    fovx = 2 * np.arctan(w / (2 * fx))
    fovy = 2 * np.arctan(h / (2 * fx))
    cfg = RasterConfig(pair_capacity=1 << 14, max_per_tile=1 << 9,
                       sh_degree=0, require_depth=True)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    cams, grays = [], []
    for i in range(4):
        r_w2c, tvec = arc_pose(i, 4)
        cam = Camera.create(r_w2c.T, tvec, fovx, fovy, w, h)
        cams.append(cam)
        img = render(*args, cam, cfg, jnp.zeros(3))["render"]
        grays.append(jnp.clip(img, 0, 1).mean(-1))
    alive = jnp.ones((means.shape[0],), bool)

    def loss_fn(ms, sc, qt, op, cap):
        out = render(ms, sc, qt, op, args[4], cams[1], cfg, jnp.zeros(3))
        ncc, geo, _wr, nq, _nb = patchmatch_losses(
            out["median_depth"], out["normal"], ms, sc, qt, op, alive,
            cams[1], cams[2], grays[1], grays[2], cfg, query_capacity=cap)
        return ncc + 0.1 * geo, (ncc, geo, nq)

    (_, (ncc_d, geo_d, _)), g_dense = jax.value_and_grad(
        lambda *a: loss_fn(*a, None), argnums=(0, 1, 2, 3),
        has_aux=True)(*args[:4])
    (_, (ncc_c, geo_c, nq)), g_comp = jax.value_and_grad(
        lambda *a: loss_fn(*a, 2048), argnums=(0, 1, 2, 3),
        has_aux=True)(*args[:4])
    assert int(nq) <= 2048 and int(nq) > 0
    np.testing.assert_allclose(float(ncc_c), float(ncc_d), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(geo_c), float(geo_d), rtol=1e-5, atol=1e-7)
    for gd, gc in zip(g_dense, g_comp):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                                   rtol=2e-4, atol=1e-6)

    # overflow: capacity 128 < n_valid truncates (watermark reports the true
    # demand) but still returns finite losses/grads
    (_, (ncc_t, geo_t, nq_t)), g_t = jax.value_and_grad(
        lambda *a: loss_fn(*a, 128), argnums=(0, 1, 2, 3),
        has_aux=True)(*args[:4])
    assert int(nq_t) == int(nq), "watermark must report the un-truncated demand"
    assert int(nq_t) > 128
    assert np.isfinite([float(ncc_t), float(geo_t)]).all()
    for g in g_t:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_ncc_block_compaction_parity():
    """Block-compacted NCC (ncc_block_capacity) must reproduce the dense
    masked NCC loss (tight: same formulas, exact f32 ref-tap blends,
    identical per-block sampler content) and gradients to the bf16
    sampler's sensitivity: the homography einsum's contraction order
    differs between the [H,W] and [B,P] shapes, and ulp-level uv changes
    shift the bf16 hat weights, so gradients agree to ~1e-4 absolute
    while losses agree to 1e-5 relative. Also checks the mv_blocks
    watermark and truncation behaviour."""
    import jax
    import jax.numpy as jnp

    from gsjax.ops.raster import RasterConfig, render
    from gsjax.ops.raster.camera import Camera
    from gsjax.train.multiview import patchmatch_losses
    from tests.scene_gen import arc_pose, make_gaussians

    w, h = 64, 32
    means, scales, quats, opac, shs = make_gaussians(120, seed=0)
    fx = 0.9 * w
    fovx = 2 * np.arctan(w / (2 * fx))
    fovy = 2 * np.arctan(h / (2 * fx))
    cfg = RasterConfig(pair_capacity=1 << 14, max_per_tile=1 << 9,
                       sh_degree=0, require_depth=True)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    cams, grays = [], []
    for i in range(4):
        r_w2c, tvec = arc_pose(i, 4)
        cam = Camera.create(r_w2c.T, tvec, fovx, fovy, w, h)
        cams.append(cam)
        img = render(*args, cam, cfg, jnp.zeros(3))["render"]
        grays.append(jnp.clip(img, 0, 1).mean(-1))
    alive = jnp.ones((means.shape[0],), bool)

    def loss_fn(ms, sc, qt, op, bcap):
        out = render(ms, sc, qt, op, args[4], cams[1], cfg, jnp.zeros(3))
        ncc, geo, _wr, _nq, nb = patchmatch_losses(
            out["median_depth"], out["normal"], ms, sc, qt, op, alive,
            cams[1], cams[2], grays[1], grays[2], cfg,
            query_capacity=2048, ncc_block_capacity=bcap)
        return ncc + 0.1 * geo, (ncc, geo, nb)

    (_, (ncc_d, geo_d, _)), g_dense = jax.value_and_grad(
        lambda *a: loss_fn(*a, None), argnums=(0, 1, 2, 3),
        has_aux=True)(*args[:4])
    (_, (ncc_c, geo_c, nb)), g_comp = jax.value_and_grad(
        lambda *a: loss_fn(*a, 16), argnums=(0, 1, 2, 3),
        has_aux=True)(*args[:4])
    assert 0 < int(nb) <= 16    # 64x32 frame = 8 blocks total
    np.testing.assert_allclose(float(ncc_c), float(ncc_d), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(float(geo_c), float(geo_d), rtol=1e-5,
                               atol=1e-7)
    for gd, gc in zip(g_dense, g_comp):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                                   atol=5e-4)

    # truncation: capacity 2 < occupied blocks drops blocks (watermark
    # reports the true demand) but stays finite
    (_, (ncc_t, _geo_t, nb_t)), g_t = jax.value_and_grad(
        lambda *a: loss_fn(*a, 2), argnums=(0, 1, 2, 3),
        has_aux=True)(*args[:4])
    assert int(nb_t) == int(nb)
    assert np.isfinite(float(ncc_t))
    for g in g_t:
        assert np.isfinite(np.asarray(g)).all()


def _mk_trainer(root, opt, model_path, appearance="no", seed=0):
    from gsjax.data.readers import build_nearest_view_graph, load_scene
    scene = load_scene(root, "images", None, False, -1, False)
    build_nearest_view_graph(scene.train_views, 30, 0.01, 1.5, 8)
    return Trainer.create(scene, opt, model_path, sh_degree=1,
                          appearance=appearance, seed=seed)


@pytest.mark.slow
def test_checkpoint_resume_equivalence(tmp_path):
    """train 10 -> full checkpoint -> resume 10  ==  train 20 straight,
    including the GOF appearance net + both Adam states (the reference's
    capture()/restore() contract, scene/gaussian_model.py:88-144)."""
    import random

    import jax

    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=5, width=64, height=32)
    opt = small_opt(iterations=20)
    opt.densify_from_iter = 10_000            # no densify: RNG key not in ckpt

    random.seed(7)
    ta = _mk_trainer(root, opt, str(tmp_path / "a"), appearance="gof")
    for _ in range(20):
        ta.step()

    random.seed(7)
    tb = _mk_trainer(root, opt, str(tmp_path / "b"), appearance="gof")
    for _ in range(10):
        tb.step()
    tb.save_ckpt()

    from gsjax.model.io import load_checkpoint
    tc = _mk_trainer(root, opt, str(tmp_path / "c"), appearance="gof")
    p, a, ad, it, extra = load_checkpoint(
        os.path.join(str(tmp_path / "b"), "chkpnt10.npz"))
    tc.params, tc.aux, tc.adam, tc.iteration = p, a, ad, it
    tc.app = app_lib.state_from_arrays(tc.app, extra)
    for _ in range(10):                        # continues b's random stream
        tc.step()

    for la, lc in zip(jax.tree_util.tree_leaves(ta.params),
                      jax.tree_util.tree_leaves(tc.params)):
        np.testing.assert_allclose(np.asarray(lc), np.asarray(la),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc.app.table),
                               np.asarray(ta.app.table), rtol=1e-5, atol=1e-7)
    for la, lc in zip(jax.tree_util.tree_leaves(ta.app.net),
                      jax.tree_util.tree_leaves(tc.app.net)):
        np.testing.assert_allclose(np.asarray(lc), np.asarray(la),
                                   rtol=1e-5, atol=1e-7)
    for la, lc in zip(jax.tree_util.tree_leaves(ta.adam.mu),
                      jax.tree_util.tree_leaves(tc.adam.mu)):
        np.testing.assert_allclose(np.asarray(lc), np.asarray(la),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_overflow_retry_matches_presized(tmp_path):
    """A trainer starting with too-small pair buffers must bump + retry the
    same view and land on EXACTLY the params of a pre-sized run (no step
    trains on truncated pairs)."""
    import random

    import jax

    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=4, width=64, height=32)
    opt = small_opt(iterations=4)
    opt.densify_from_iter = 10_000

    random.seed(3)
    small = _mk_trainer(root, opt, str(tmp_path / "s"))
    small.pair_capacity = 1 << 4              # the scene bins ~6-27 pairs/view
    small.max_per_tile = 1 << 3               # ... with tiles up to ~15 deep
    for _ in range(3):
        small.step()
    assert small.pair_capacity > (1 << 4)     # the retry actually bumped

    random.seed(3)
    big = _mk_trainer(root, opt, str(tmp_path / "p"))
    big.pair_capacity = 1 << 14
    big.max_per_tile = 1 << 10
    for _ in range(3):
        big.step()

    for ls, lb in zip(jax.tree_util.tree_leaves(small.params),
                      jax.tree_util.tree_leaves(big.params)):
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lb),
                                   rtol=1e-6, atol=1e-7)


def test_gt_cache_lru():
    """gt_for caches device frames (keyed by image_name — uids collide
    across train/test splits) under a byte budget, evicting least-recent."""
    import types

    t = Trainer.__new__(Trainer)
    t.white_background = False
    t._gt_cache = {}
    img = np.random.default_rng(0).uniform(0, 1, (4, 6, 3)).astype(np.float32)
    t.gt_cache_bytes = 2 * img.size * 4          # room for exactly 2 frames
    views = [types.SimpleNamespace(uid=0, image=img + i, mask=None,
                                   image_name=f"im{i}")
             for i in range(3)]                  # same uid on purpose
    a0 = t.gt_for(views[0])
    assert t.gt_for(views[0]) is a0              # hit
    a1 = t.gt_for(views[1])
    assert a1 is not a0                          # uid collision must miss
    t.gt_for(views[2])                           # evicts im0
    assert set(t._gt_cache) == {"im1", "im2"}
    a0b = t.gt_for(views[0])                     # re-uploaded, fresh buffer
    assert a0b is not a0
    np.testing.assert_allclose(np.asarray(a0b), np.asarray(a0))


@pytest.mark.slow
def test_debug_mosaic_written(tmp_path):
    """--debug writes the PatchMatch-style gt/render/normal/depth mosaic."""
    root = str(tmp_path / "scene")
    os.makedirs(root)
    write_synthetic_colmap(root, n_images=4, width=64, height=32)
    opt = small_opt(iterations=1)
    t = _mk_trainer(root, opt, str(tmp_path / "out"))
    v = t.scene.train_views[0]
    t._dump_debug_mosaic(v, 200)
    path = os.path.join(str(tmp_path / "out"), "debug",
                        f"00200_{v.image_name}.jpg")
    assert os.path.exists(path)
    from PIL import Image
    w, h = Image.open(path).size
    assert (w, h) == (128, 64)          # 2x2 of 64x32


def test_model_ply_roundtrip_with_sg(tmp_path):
    """PLY save/load preserves spherical-gaussian lobes + filter_3D
    (reference save_ply attrs, scene/gaussian_model.py:450-611)."""
    import dataclasses

    import jax

    from gsjax.ops.knn import mean_knn_dist2
    from tests.util import random_gaussians

    means, scales, q, op, shs = random_gaussians(30, seed=4)
    colors = np.clip(shs[:, 0] * 0.28 + 0.5, 0, 1)
    params, aux = gm.init_from_pcd(means, colors, 48, 2, 3,
                                   mean_knn_dist2(means))
    key = jax.random.PRNGKey(5)
    params = dataclasses.replace(
        params,
        sg_axis=jax.random.normal(key, params.sg_axis.shape),
        sg_sharpness=jax.random.uniform(key, params.sg_sharpness.shape),
        sg_color=jax.random.normal(key, params.sg_color.shape) * 0.2)
    aux = dataclasses.replace(
        aux, filter_3d=jax.random.uniform(key, aux.filter_3d.shape))
    path = str(tmp_path / "sg.ply")
    save_ply(path, params, aux)
    p2, a2 = load_ply(path)
    alive = np.asarray(aux.alive)
    for field in ("sg_axis", "sg_sharpness", "sg_color"):
        np.testing.assert_allclose(
            np.asarray(getattr(p2, field))[:30],
            np.asarray(getattr(params, field))[alive], atol=1e-6), field
    np.testing.assert_allclose(np.asarray(a2.filter_3d)[:30],
                               np.asarray(aux.filter_3d)[alive], atol=1e-6)


@pytest.mark.slow
def test_blender_end_to_end_training(tmp_path, monkeypatch):
    """A Blender transforms_train.json dataset trains through the full CLI
    driver (white-background compositing path incl. opacity reset at
    densify_from for white_background, train.py:247-249)."""
    import json as _json

    from PIL import Image

    # the reference inits synthetic scenes with 100k random points
    # (dataset_readers.py:300-310) — far too heavy for a CPU unit test
    monkeypatch.setenv("GSJAX_BLENDER_INIT_POINTS", "400")

    root = str(tmp_path / "blender")
    os.makedirs(os.path.join(root, "train"))
    rng = np.random.default_rng(1)
    frames = []
    for i in range(4):
        ang = 0.25 * i
        c2w = np.eye(4)
        c2w[0, 0] = c2w[2, 2] = np.cos(ang)
        c2w[0, 2] = np.sin(ang)
        c2w[2, 0] = -np.sin(ang)
        c2w[:3, 3] = [3.2 * np.sin(ang), 0.0, 3.2 * np.cos(ang)]
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = (rng.random((32, 48, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255
        Image.fromarray(img, "RGBA").save(
            os.path.join(root, "train", f"r_{i}.png"))
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        _json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    from gsjax.config import ModelParams
    lp = Namespace(**ModelParams._defaults())
    lp.source_path = root
    lp.model_path = str(tmp_path / "out")
    lp.eval = False
    lp.sh_degree = 1
    lp.white_background = True
    args = Namespace(test_iterations=[], save_iterations=[6],
                     checkpoint_iterations=[], start_checkpoint=None)
    trainer = run_training(lp, small_opt(iterations=6), None, args)
    assert trainer.iteration == 6
    assert trainer.white_background
    assert os.path.exists(os.path.join(
        lp.model_path, "point_cloud", "iteration_6", "point_cloud.ply"))
