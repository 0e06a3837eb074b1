"""Parity of the XLA renderer against the brute-force numpy oracle."""

import jax.numpy as jnp
import numpy as np

from gsjax.ops.raster import RasterConfig, render
from tests.oracle import preprocess_np, render_np
from tests.util import look_at_camera, random_gaussians


def run_both(n=120, seed=3, width=96, height=64, kernel_size=0.0, bg=(0, 0, 0),
             sh_degree=2, require_depth=True):
    means, scales, q, op, shs = random_gaussians(n, seed=seed)
    cam = look_at_camera(width=width, height=height)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=sh_degree,
                       kernel_size=kernel_size, require_depth=require_depth)
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(op), jnp.asarray(shs), cam, cfg,
                 jnp.asarray(np.asarray(bg, np.float32)))
    prep = preprocess_np(means, scales, q, op, shs, cam, sh_degree,
                         kernel_size=kernel_size)
    ref = render_np(prep, cam, np.asarray(bg), require_depth=require_depth)
    return out, ref


def test_color_alpha_parity():
    out, ref = run_both()
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref["alpha"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=5e-4, rtol=1e-3)
    assert (np.asarray(out["n_contrib"]) == ref["n_contrib"]).mean() > 0.999


def test_normal_parity():
    out, ref = run_both()
    np.testing.assert_allclose(np.asarray(out["normal"]), ref["normal"],
                               atol=1e-3, rtol=1e-3)


def test_median_depth_parity():
    out, ref = run_both()
    got = np.asarray(out["median_depth"])
    want = ref["median_depth"]
    # bisection involves >=/<= 0.5 branch decisions; allow tiny fraction of
    # pixels to disagree near the decision boundary, rest must match closely.
    close = np.isclose(got, want, atol=2e-3, rtol=1e-3)
    assert close.mean() > 0.995, f"median depth mismatch on {(~close).mean():.2%} pixels"


def test_mip_kernel_size_parity():
    out, ref = run_both(kernel_size=0.3, seed=11)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=5e-4, rtol=1e-3)


def test_white_background():
    out, ref = run_both(bg=(1, 1, 1), seed=5)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=5e-4, rtol=1e-3)


def test_spherical_gaussian_parity():
    """SG colour lobes (sg_degree > 0) match the float64 oracle — the
    mip360 recipe path (--sg_degree 7, scripts/mip360.sh)."""
    n, sg_deg = 80, 3
    means, scales, q, op, shs = random_gaussians(n, seed=9)
    rng = np.random.default_rng(10)
    sg_axis = rng.normal(0, 1, (n, sg_deg, 3)).astype(np.float32)
    # render() takes post-activation params: unit axes (gm.get_sg_axis) and
    # post-softplus sharpness
    sg_axis /= np.linalg.norm(sg_axis, axis=2, keepdims=True)
    sg_sharpness = rng.uniform(1.0, 6.0, (n, sg_deg)).astype(np.float32)
    sg_color = (0.3 * rng.normal(0, 1, (n, sg_deg, 3))).astype(np.float32)
    cam = look_at_camera(width=96, height=64)
    cfg = RasterConfig(tile=32, chunk=32, tile_batch=2, pair_capacity=1 << 13,
                       max_per_tile=256, sh_degree=2, sg_degree=sg_deg,
                       require_depth=False)
    out = render(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                 jnp.asarray(op), jnp.asarray(shs), cam, cfg, jnp.zeros(3),
                 sg_axis=jnp.asarray(sg_axis),
                 sg_sharpness=jnp.asarray(sg_sharpness),
                 sg_color=jnp.asarray(sg_color))
    prep = preprocess_np(means, scales, q, op, shs, cam, 2,
                         sg_axis=sg_axis, sg_sharpness=sg_sharpness,
                         sg_color=sg_color, sg_degree=sg_deg)
    ref = render_np(prep, cam, np.zeros(3), require_depth=False)
    np.testing.assert_allclose(np.asarray(out["render"]), ref["render"],
                               atol=1e-3, rtol=2e-3)


def test_ellipse_cull_box_min_is_safe():
    """The binning cull's box-min of q over a tile must never exceed the
    true minimum over the tile's pixel grid (else a contributing pair could
    be culled). Brute-force check over random anisotropic conics."""
    import math

    rng = np.random.default_rng(0)
    tile = 32
    alpha_min = 1.0 / 255.0
    n_checked = n_culled = 0
    for _ in range(400):
        # random PSD conic with up to ~20:1 anisotropy, random tile offset
        th = rng.uniform(0, np.pi)
        l1 = rng.uniform(1e-4, 0.5)
        l2 = l1 * rng.uniform(1.0, 20.0)
        c, s = np.cos(th), np.sin(th)
        r = np.array([[c, -s], [s, c]])
        m = r @ np.diag([l1, l2]) @ r.T
        ca, cb, cc = m[0, 0], m[0, 1], m[1, 1]
        gx = rng.uniform(-40, 70)
        gy = rng.uniform(-40, 70)
        op = rng.uniform(0.01, 0.99)

        # binning.py's box-min (dx = gx - px over the pixel box)
        ax, bx = gx - (tile - 1), gx
        ay, by = gy - (tile - 1), gy

        def q(dx, dy):
            return 0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy

        if ax <= 0 <= bx and ay <= 0 <= by:
            q_min = 0.0
        else:
            cl = lambda v, lo, hi: min(max(v, lo), hi)
            q_min = min(
                q(ax, cl(-cb * ax / max(cc, 1e-12), ay, by)),
                q(bx, cl(-cb * bx / max(cc, 1e-12), ay, by)),
                q(cl(-cb * ay / max(ca, 1e-12), ax, bx), ay),
                q(cl(-cb * by / max(ca, 1e-12), ax, bx), by))

        # true grid min over the tile's pixels
        px, py = np.meshgrid(np.arange(tile), np.arange(tile))
        dx = gx - px.ravel()
        dy = gy - py.ravel()
        q_grid = (0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy)
        assert q_min <= q_grid.min() + 1e-6, \
            f"box-min {q_min} > grid-min {q_grid.min()}"
        n_checked += 1
        thr = math.log(max(op, 1e-12) / alpha_min)
        if q_min > thr + 1e-3:
            # culled: every pixel must indeed fail the alpha test
            assert (op * np.exp(-q_grid) < alpha_min).all()
            n_culled += 1
    assert n_checked == 400 and n_culled > 50   # the cull actually fires


def test_ellipse_cull_continuous_coords_box():
    """ADVICE r4 (medium): the point-query path evaluates pairs at CONTINUOUS
    coordinates, which can land in the sub-pixel strip (tile-1, tile) past a
    tile's last pixel centre. bin_gaussians(continuous_coords=True) must keep
    a pair whose alpha only reaches alpha_min inside that strip; the default
    pixel-centre box may cull it (that is correct for the render kernels)."""
    import dataclasses

    import jax

    from gsjax.ops.raster.binning import bin_gaussians
    from gsjax.ops.raster.preprocess import Preprocessed

    # one sharp low-opacity gaussian centred at x=31.7 (inside tile 0's strip)
    f = jnp.float32
    prep = Preprocessed(
        mean2d=jnp.asarray([[31.7, 8.0]], f),
        depth=jnp.asarray([5.0], f),
        radius=jnp.asarray([5], jnp.int32),
        conic=jnp.asarray([[3.0, 0.0, 3.0]], f),
        opacity=jnp.asarray([0.005], f),
        color=jnp.zeros((1, 3), f),
        ray_plane=jnp.zeros((1, 4), f),
        normal=jnp.zeros((1, 3), f),
        rect_min=jnp.asarray([[0, 0]], jnp.int32),
        rect_wh=jnp.asarray([[2, 1]], jnp.int32),
        tiles_touched=jnp.asarray([2], jnp.int32),
        valid=jnp.asarray([True]),
    )
    cfg = RasterConfig(tile=32, pair_capacity=64, max_per_tile=32)
    # thr = ln(op/alpha_min) = ln(1.275) ~ 0.243
    # pixel-centre box of tile 0: min q = q(31.7-31, 0) = 0.5*3*0.49 = 0.735
    #   -> culled (correct for integer pixel centres: none reaches alpha_min)
    # continuous box of tile 0: centre inside -> q_min = 0 -> kept
    b_pix = bin_gaussians(prep, cfg, 64, 32, continuous_coords=False)
    b_cont = bin_gaussians(prep, cfg, 64, 32, continuous_coords=True)
    assert int(b_pix.tile_count[0]) == 0, "pixel-centre box should cull tile 0"
    assert int(b_cont.tile_count[0]) == 1, \
        "continuous box must keep the strip-only pair (ADVICE r4 medium)"
    # tile 1 (x in [32,63]): q(31.7-32,0) = 0.135 <= thr -> kept in both
    assert int(b_pix.tile_count[1]) == 1 and int(b_cont.tile_count[1]) == 1


def test_ellipse_cull_continuous_box_min_is_safe():
    """Continuous-box variant of the safety property: the box-min over
    [0, tile] must never exceed q at ANY continuous coordinate in the tile
    extent [0, tile) (query points live there, not just pixel centres)."""
    rng = np.random.default_rng(7)
    tile = 32
    for _ in range(300):
        th = rng.uniform(0, np.pi)
        l1 = rng.uniform(1e-4, 0.5)
        l2 = l1 * rng.uniform(1.0, 20.0)
        c, s = np.cos(th), np.sin(th)
        r = np.array([[c, -s], [s, c]])
        m = r @ np.diag([l1, l2]) @ r.T
        ca, cb, cc = m[0, 0], m[0, 1], m[1, 1]
        gx = rng.uniform(-40, 70)
        gy = rng.uniform(-40, 70)

        # binning.py continuous box: dx = gx - px over px in [0, tile]
        ax, bx = gx - tile, gx
        ay, by = gy - tile, gy

        def q(dx, dy):
            return 0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy

        if ax <= 0 <= bx and ay <= 0 <= by:
            q_min = 0.0
        else:
            cl = lambda v, lo, hi: min(max(v, lo), hi)
            q_min = min(
                q(ax, cl(-cb * ax / max(cc, 1e-12), ay, by)),
                q(bx, cl(-cb * bx / max(cc, 1e-12), ay, by)),
                q(cl(-cb * ay / max(ca, 1e-12), ax, bx), ay),
                q(cl(-cb * by / max(ca, 1e-12), ax, bx), by))

        # continuous sample points in [0, tile) incl. the sub-pixel strip
        px = rng.uniform(0, tile, 512)
        py = rng.uniform(0, tile, 512)
        px[:8] = rng.uniform(tile - 1, tile, 8)   # force strip coverage
        dx, dy = gx - px, gy - py
        q_pts = 0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy
        assert q_min <= q_pts.min() + 1e-6
