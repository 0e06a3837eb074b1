"""Multi-chip data parallelism: tiles sharded over the device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3); this layer is the
TPU-native scaling design: gaussians replicated, *tiles/rays sharded* across
chips over ICI, parameter gradients psum-reduced inside the shard_mapped
backward. Densification stays replicated (identical on every device, keyed by
the same PRNG), so no cross-host reshuffling is required — each device holds
the full (small) parameter set while the pixel work scales linearly.

Layout per device under `shard_map`:
  - preprocess: computed replicated (single cheap per-gaussian pass).
  - binning: per-device — each chip expands/sorts only its own row band's
    (gaussian, tile) pairs (bin_gaussians row_lo/row_hi), so the sort +
    re-layout cost scales down with the mesh.
  - tile blend: each device renders its row band of tiles.
  - images: all_gathered so non-local losses (SSIM windows crossing tile
    boundaries) see the full frame; autodiff turns the gather into a scatter
    of image grads back to the owning device.
  - parameter grads: explicit psum over the mesh axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsjax.model import gaussians as gm
from gsjax.ops.raster import render_pallas, render_ref
from gsjax.ops.raster.api import _use_pallas
from gsjax.ops.raster.binning import bin_gaussians
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig
from gsjax.ops.raster.preprocess import preprocess
from gsjax.train import losses
from gsjax.train.step import LossConfig

AXIS = "tiles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def _render_local_tiles_pallas(prep, binning, camera: Camera,
                               cfg: RasterConfig, bg, my_tiles):
    """Pallas blend of a device-local slice of tiles (same per-chip kernels
    as the single-chip path; tile ids address global pixel coordinates)."""
    tiles_x, _ = cfg.grid(camera.width, camera.height)
    num_tiles_global = binning.tile_start.shape[0]
    t_local = my_tiles.shape[0]
    interpret = jax.default_backend() != "tpu"

    feats = render_ref.prepare_pairs(prep, binning, cfg)
    feats_t = render_pallas.pack_features_t(feats, cfg)
    in_bounds = my_tiles < num_tiles_global
    safe_ids = jnp.minimum(my_tiles, num_tiles_global - 1)
    starts = jnp.where(in_bounds, binning.tile_start[safe_ids], 0)
    counts = jnp.where(in_bounds, binning.tile_count[safe_ids], 0)
    cam_params = jnp.concatenate([
        jnp.asarray([camera.fx, camera.fy], jnp.float32),
        bg.astype(jnp.float32).reshape(3),
        jnp.asarray([camera.width, camera.height, 0.0], jnp.float32)])
    out = render_pallas.blend_pallas(
        feats_t, safe_ids, starts, counts, cam_params, cfg,
        tiles_x, t_local, interpret)
    return {
        "color": jnp.moveaxis(out[:, 0:3, :], 1, -1),
        "normal": jnp.moveaxis(out[:, 3:6, :], 1, -1),
        "alpha": out[:, 6, :],
        "median_depth": out[:, 7, :],
    }


def _render_local_tiles(prep, binning, camera: Camera, cfg: RasterConfig,
                        bg, my_tiles):
    """Blend a device-local slice of tiles. my_tiles: [T_local] global ids."""
    if _use_pallas(cfg):
        return _render_local_tiles_pallas(prep, binning, camera, cfg, bg,
                                          my_tiles)
    tiles_x, _ = cfg.grid(camera.width, camera.height)
    num_tiles_global = binning.tile_start.shape[0]
    t_local = my_tiles.shape[0]

    feats = render_ref.prepare_pairs(prep, binning, cfg)

    in_bounds = my_tiles < num_tiles_global
    safe_ids = jnp.minimum(my_tiles, num_tiles_global - 1)
    starts = jnp.where(in_bounds, binning.tile_start[safe_ids], 0)
    counts = jnp.where(in_bounds, binning.tile_count[safe_ids], 0)

    # small tile batches bound peak memory; count-sort within the device
    bs = min(cfg.tile_batch, t_local)
    nb = -(-t_local // bs)
    pad = nb * bs - t_local
    def padded(x):
        return jnp.pad(x, (0, pad))
    safe_p, starts_p, counts_p = padded(safe_ids), padded(starts), padded(counts)
    order = jnp.argsort(-counts_p)
    inv_order = jnp.argsort(order)
    safe_p, starts_p, counts_p = safe_p[order], starts_p[order], counts_p[order]

    def batch(_, b):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, b * bs, bs)
        out = render_ref.blend_tiles_batch(
            feats, sl(safe_p), sl(starts_p), sl(counts_p), tiles_x, cfg, bg,
            camera.width, camera.height, camera.fx, camera.fy)
        out.pop("n_contrib")
        return None, out

    _, outs = jax.lax.scan(batch, None, jnp.arange(nb))
    return {k: v.reshape((nb * bs,) + v.shape[2:])[inv_order][:t_local]
            for k, v in outs.items()}


def _tiles_to_image(tiles, tiles_x, tiles_y, width, height, cfg: RasterConfig):
    t = cfg.tile
    ch = tiles.shape[2:]
    v = tiles[: tiles_x * tiles_y].reshape((tiles_y, tiles_x, t, t) + ch)
    v = jnp.moveaxis(v, 2, 1).reshape((tiles_y * t, tiles_x * t) + ch)
    return v[:height, :width]


def equal_band_bounds(tiles_y: int, n_dev: int) -> np.ndarray:
    """Equal tile-row partition boundaries: device d owns rows [b[d], b[d+1])."""
    rows_per = -(-tiles_y // n_dev)
    return np.minimum(np.arange(n_dev + 1) * rows_per, tiles_y).astype(np.int32)


def balance_band_bounds(row_pairs, n_dev: int,
                        rows_per_max: int) -> np.ndarray:
    """Equal-PAIR contiguous tile-row partition (host-side, numpy).

    Equal-row bands give each device equal PIXELS, not equal PAIRS: on real
    scenes gaussians cluster centrally, so central bands can carry several
    times the blend work of edge bands, capping strong-scaling efficiency at
    mean/max pair share. This picks contiguous row boundaries so every band's
    pair count approximates total/n_dev, subject to

      - band height <= rows_per_max (the static Pallas grid bound), and
      - full coverage of [0, tiles_y) (bands may be empty).

    Boundaries are traced inputs of the sharded step, so re-choosing them
    every step from the previous step's psum'd per-row pair counts
    (`metrics["row_pairs"]`) never recompiles. Any valid partition yields
    bit-identical losses/gradients — only the work distribution changes.
    """
    row_pairs = np.asarray(row_pairs, np.float64)
    tiles_y = row_pairs.shape[0]
    if n_dev * rows_per_max < tiles_y:
        raise ValueError(
            f"rows_per_max={rows_per_max} x {n_dev} devices cannot cover "
            f"{tiles_y} tile rows")
    w = row_pairs + 1e-3                      # keep empty rows assignable
    cum = np.concatenate([[0.0], np.cumsum(w)])
    total = cum[-1]
    b = np.zeros(n_dev + 1, np.int64)
    b[n_dev] = tiles_y
    for d in range(1, n_dev):
        q = int(np.searchsorted(cum, total * d / n_dev, side="left"))
        lo = max(b[d - 1], tiles_y - (n_dev - d) * rows_per_max)
        hi = min(b[d - 1] + rows_per_max, tiles_y)
        b[d] = min(max(q, lo), hi)
    return b.astype(np.int32)


def dual_balance_bounds(row_pairs, n_dev: int,
                        band_cap: int) -> np.ndarray:
    """Mirrored dual-band partition: [2n+1] row boundaries where device d
    owns bands d and 2n-1-d. Starting from the greedy equal-pair 2n-split,
    interior boundaries hill-climb (+-1 row, respecting band_cap) to
    minimise the max PAIRED share — the greedy quantiles alone don't beat a
    single contiguous partition because pairing errors add (host-side,
    numpy; a few hundred cheap iterations over ~tens of rows)."""
    w = np.asarray(row_pairs, np.float64) + 1e-3
    tiles_y = w.shape[0]
    nb = 2 * n_dev
    cum = np.concatenate([[0.0], np.cumsum(w)])
    b = balance_band_bounds(row_pairs, nb, band_cap).astype(np.int64)

    def dev_shares(bb):
        band = cum[bb[1:]] - cum[bb[:-1]]
        return band[:n_dev] + band[nb - 1:n_dev - 1:-1]

    cur = dev_shares(b)
    for _ in range(50 * nb):
        best_gain, best = 0.0, None
        worst = cur.max()
        for i in range(1, nb):
            for dlt in (-1, 1):
                v = b[i] + dlt
                if not (b[i - 1] <= v <= b[i + 1]):
                    continue
                if (v - b[i - 1] > band_cap) or (b[i + 1] - v > band_cap):
                    continue
                b2 = b.copy()
                b2[i] = v
                m = dev_shares(b2).max()
                if worst - m > best_gain:
                    best_gain, best = worst - m, b2
        if best is None:
            break
        b = best
        cur = dev_shares(b)
    return b.astype(np.int32)


def pair_bands(shares, band_rows, rows_per_max: int) -> np.ndarray:
    """Greedy matching of 2n bands into n (band_a, band_b) device pairs:
    heaviest unpaired band joins the lightest partner whose combined height
    fits rows_per_max. Returns [n,2] int32 with pair[:,0] < pair[:,1].

    The mirrored pairing (band d with 2n-1-d) couples the two CENTRAL bands
    — on centre-heavy scenes that device carries ~2x the edge devices
    (SCALING_MODEL_r04: share_max 0.076 vs ideal 0.0625 at 16 devices);
    heavy-with-light matching removes exactly that."""
    nb = len(shares)
    order = np.argsort(-np.asarray(shares, np.float64))
    unpaired = list(order)
    pairs = []
    while unpaired:
        a = unpaired.pop(0)                     # heaviest remaining
        pick = None
        for j in range(len(unpaired) - 1, -1, -1):   # lightest first
            if band_rows[a] + band_rows[unpaired[j]] <= rows_per_max:
                pick = j
                break
        if pick is None:
            pick = len(unpaired) - 1            # infeasible: least-bad
        b = unpaired.pop(pick)
        pairs.append((min(a, b), max(a, b)))
    return np.asarray(sorted(pairs), np.int32)


def paired_balance_bounds(row_pairs, n_dev: int,
                          rows_per_max: int):
    """Free-paired dual-band partition: (bounds [2n+1], band_pair [n,2]).

    Cuts the rows into 2n contiguous bands at greedy equal-pair quantiles,
    matches bands heavy-with-light (`pair_bands`), then hill-climbs the
    boundaries (+-1 row, re-matching after each move) to minimise the max
    per-DEVICE share, subject to each device's total height <= rows_per_max
    (the static Pallas grid bound). Host-side numpy; any valid partition +
    matching yields bit-identical losses/gradients."""
    w = np.asarray(row_pairs, np.float64) + 1e-3
    tiles_y = w.shape[0]
    nb = 2 * n_dev
    cum = np.concatenate([[0.0], np.cumsum(w)])
    # initial bands capped at rows_per_max//2 so EVERY matching is feasible
    # at the start; the climb may then grow a band up to rows_per_max minus
    # its partner's height (enforced through best_match's feasibility
    # penalty)
    b = balance_band_bounds(row_pairs, nb,
                            max(rows_per_max // 2, 1)).astype(np.int64)

    def best_match(bb):
        shares = cum[bb[1:]] - cum[bb[:-1]]
        rows = bb[1:] - bb[:-1]
        pr = pair_bands(shares, rows, rows_per_max)
        dev = shares[pr[:, 0]] + shares[pr[:, 1]]
        hfit = (rows[pr[:, 0]] + rows[pr[:, 1]] <= rows_per_max).all()
        return pr, float(dev.max()) + (0.0 if hfit else 1e18)

    pair, cur = best_match(b)
    for _ in range(30 * nb):
        best_gain, best = 0.0, None
        for i in range(1, nb):
            for dlt in (-1, 1):
                v = b[i] + dlt
                if not (b[i - 1] <= v <= b[i + 1]):
                    continue
                b2 = b.copy()
                b2[i] = v
                pr2, m = best_match(b2)
                if cur - m > best_gain:
                    best_gain, best = cur - m, (b2, pr2, m)
        if best is None:
            break
        b, pair, cur = best
    return b.astype(np.int32), pair


def _band_grid(camera: Camera, cfg: RasterConfig, n_dev: int):
    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    rows_per = -(-tiles_y // n_dev)
    return tiles_x, tiles_y, rows_per


def _my_band_tiles(row_bounds, i_dev, rows_per_max: int, tiles_x: int,
                   num_tiles: int, n_dev: int | None = None,
                   band_pair=None):
    """Global tile ids of this device's band(s), padded to the static
    rows_per_max x tiles_x grid with the sentinel `num_tiles` (downstream
    masks force count=0 for sentinel tiles).

    With a [n_dev+1] partition the device owns rows
    [row_bounds[i], row_bounds[i+1]). With a [2*n_dev+1] partition it owns
    TWO bands, laid consecutively in its local buffer (band A rows first):
    bands band_pair[i] when given (free heavy-with-light matching,
    `paired_balance_bounds`), else the mirrored (i, 2*n_dev-1-i)."""
    r_loc = jnp.arange(rows_per_max, dtype=jnp.int32)
    if n_dev is not None and row_bounds.shape[0] == 2 * n_dev + 1:
        if band_pair is None:
            ba, bb = i_dev, 2 * n_dev - 1 - i_dev
        else:
            ba, bb = band_pair[i_dev, 0], band_pair[i_dev, 1]
        len_a = row_bounds[ba + 1] - row_bounds[ba]
        len_b = row_bounds[bb + 1] - row_bounds[bb]
        rows = jnp.where(r_loc < len_a,
                         row_bounds[ba] + r_loc,
                         row_bounds[bb] + (r_loc - len_a))
        in_band = r_loc < len_a + len_b
    else:
        rows = row_bounds[i_dev] + r_loc
        in_band = rows < row_bounds[i_dev + 1]
    t2d = rows[:, None] * tiles_x + \
        jnp.arange(tiles_x, dtype=jnp.int32)[None, :]
    return jnp.where(in_band[:, None], t2d, num_tiles).reshape(-1)


def _assemble_band_tiles(local: dict, row_bounds, rows_per_max: int,
                         tiles_x: int, tiles_y: int,
                         n_dev: int | None = None, band_pair=None) -> dict:
    """all_gather per-device tile buffers and re-order into global tile order.

    Device d's buffer holds its band rows (both bands, consecutively, under
    the mirrored dual partition) padded to rows_per_max; a searchsorted
    owner map gathers each global tile row from its owner's slot. The
    gather's transpose scatters loss cotangents back to the owning device
    (out-of-band slots get zero), so gradients through the reassembly are
    exact for ANY valid partition."""
    g_rows = jnp.arange(tiles_y, dtype=jnp.int32)
    # smallest band k with row_bounds[k+1] > r; [1:-1] implicitly clamps
    k_band = jnp.searchsorted(row_bounds[1:-1], g_rows,
                              side="right").astype(jnp.int32)
    if n_dev is not None and row_bounds.shape[0] == 2 * n_dev + 1:
        if band_pair is None:
            owner = jnp.where(k_band < n_dev, k_band, 2 * n_dev - 1 - k_band)
            is_a = k_band < n_dev
            first = jnp.where(is_a, k_band, 2 * n_dev - 1 - k_band)
        else:
            nb = 2 * n_dev
            dev_ids = jnp.arange(n_dev, dtype=jnp.int32)
            band_owner = jnp.zeros((nb,), jnp.int32) \
                .at[band_pair[:, 0]].set(dev_ids) \
                .at[band_pair[:, 1]].set(dev_ids)
            band_is_a = jnp.zeros((nb,), bool).at[band_pair[:, 0]].set(True)
            owner = band_owner[k_band]
            is_a = band_is_a[k_band]
            first = band_pair[owner, 0]
        # band A sits at local row 0; band B after band A's rows
        len_a = row_bounds[first + 1] - row_bounds[first]
        slot = jnp.where(is_a,
                         g_rows - row_bounds[k_band],
                         len_a + (g_rows - row_bounds[k_band]))
    else:
        owner = k_band
        slot = g_rows - row_bounds[owner]
    base = owner * (rows_per_max * tiles_x) + slot * tiles_x
    idx = (base[:, None] +
           jnp.arange(tiles_x, dtype=jnp.int32)[None, :]).reshape(-1)
    return {k: jax.lax.all_gather(v, AXIS, tiled=True)[idx]
            for k, v in local.items()}


def render_sharded(params: gm.GaussianParams, aux: gm.GaussianAux,
                   camera: Camera, cfg: RasterConfig, bg, mesh: Mesh,
                   dev_pair_capacity: int | None = None,
                   row_bounds=None, rows_per_max: int | None = None):
    """Full-frame render with tiles sharded over the mesh.

    `row_bounds` ([n_dev+1] tile-row partition, see `balance_band_bounds`)
    defaults to equal rows; `rows_per_max` is the static per-device row cap
    (>= the widest band)."""
    n_dev = mesh.devices.size
    tiles_x, tiles_y, rows_per = _band_grid(camera, cfg, n_dev)
    if row_bounds is None:
        row_bounds = equal_band_bounds(tiles_y, n_dev)
    if rows_per_max is None:
        rows_per_max = rows_per
    num_tiles = tiles_x * tiles_y
    row_bounds = jnp.asarray(row_bounds, jnp.int32)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()),
             out_specs=P(), check_vma=False)
    def run(p, aux_, bg_, rb):
        scales, opac = gm.scaling_n_opacity_with_3d_filter(p, aux_.filter_3d)
        prep = preprocess(p.xyz, scales, p.rotation, opac, gm.get_features(p),
                          gm.get_sg_axis(p), gm.get_sg_sharpness(p), p.sg_color,
                          camera, cfg, aux_.alive)
        i_dev = jax.lax.axis_index(AXIS)
        binning = bin_gaussians(prep, cfg, camera.width, camera.height,
                                row_lo=rb[i_dev], row_hi=rb[i_dev + 1],
                                pair_capacity=dev_pair_capacity)
        my_tiles = _my_band_tiles(rb, i_dev, rows_per_max, tiles_x, num_tiles)
        local = _render_local_tiles(prep, binning, camera, cfg, bg_, my_tiles)
        return _assemble_band_tiles(local, rb, rows_per_max, tiles_x, tiles_y)

    tiles = run(params, aux, bg, row_bounds)
    return {k: _tiles_to_image(v, tiles_x, tiles_y, camera.width, camera.height, cfg)
            for k, v in tiles.items()}


def stack_cameras(cams) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree (leading
    axis = view). Width/height are static treedef metadata, so they must
    match across the batch."""
    w, h = cams[0].width, cams[0].height
    if any(c.width != w or c.height != h for c in cams):
        raise ValueError("stack_cameras requires a uniform resolution batch")
    import numpy as np

    return jax.tree.map(lambda *xs: np.stack(xs), *cams)


def render_views_sharded(params: gm.GaussianParams, aux: gm.GaussianAux,
                         cameras, cfg: RasterConfig, bg, mesh: Mesh):
    """Batch NVS serving: views data-parallel over the device mesh.

    The training path shards TILES of one frame (`render_sharded`) to cut
    per-step latency; for offline/serving rendering the natural scale-out is
    whole VIEWS — each chip renders different cameras with the replicated
    model, no collectives except the output layout. The reference has no
    analog (single-GPU, one view at a time, render.py:32).

    `cameras` is a list of same-resolution `Camera`s or an already-stacked
    batched Camera. The batch is padded to a multiple of the mesh size by
    repeating the last view; only the real views are returned.

    Returns dict of [B, H, W, ...] arrays (render/alpha/normal/median_depth).
    """
    cams = stack_cameras(cameras) if isinstance(cameras, (list, tuple)) \
        else cameras
    b = cams.campos.shape[0]
    n_dev = mesh.devices.size
    pad = (-b) % n_dev
    if pad:
        cams = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)]), cams)
    out = _render_views_jit(params, aux, bg, cams, cfg, mesh)
    return {k: v[:b] for k, v in out.items()}


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _render_views_jit(params, aux, bg, cams, cfg: RasterConfig, mesh: Mesh):
    from gsjax.ops.raster.api import render

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P(AXIS)),
             out_specs=P(AXIS), check_vma=False)
    def run(p, aux_, bg_, my_cams):
        scales, opac = gm.scaling_n_opacity_with_3d_filter(p, aux_.filter_3d)
        feats = gm.get_features(p)
        sga, sgs = gm.get_sg_axis(p), gm.get_sg_sharpness(p)

        def one(cam):
            out = render(p.xyz, scales, p.rotation, opac, feats, cam, cfg,
                         bg_, sg_axis=sga, sg_sharpness=sgs,
                         sg_color=p.sg_color, alive=aux_.alive)
            return {k: out[k]
                    for k in ("render", "alpha", "normal", "median_depth")}

        return jax.lax.map(one, my_cams)

    return run(params, aux, bg, cams)


def _row_slice(x, r0, nrows, total_rows):
    """Slice `nrows` rows starting at traced offset r0, zero-padding the row
    axis to `total_rows` first so the slice never clamps."""
    pad = total_rows - x.shape[0]
    xp = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return jax.lax.dynamic_slice_in_dim(xp, r0, nrows, 0)


def train_step_sharded(params: gm.GaussianParams, aux: gm.GaussianAux,
                       adam: gm.AdamState, camera: Camera, gt_image, bg,
                       lrs, cfg: RasterConfig, loss_cfg: LossConfig, mesh: Mesh,
                       app_embedding: jax.Array | None = None,
                       app_net: dict | None = None,
                       near_cam: Camera | None = None,
                       gray_r=None, gray_n=None,
                       dev_pair_capacity: int | None = None,
                       row_bounds=None, rows_per_max: int | None = None,
                       band_pair=None):
    """Thin default-filling wrapper. Defaults are canonicalised BEFORE the
    jit boundary: a `row_bounds=None` call and an explicit equal-bounds call
    must hit the SAME compiled program (None is a different pytree treedef —
    round 2's dryrun recompiled the whole step over exactly this)."""
    n_dev = mesh.devices.size
    _, tiles_y, rows_per = _band_grid(camera, cfg, n_dev)
    if row_bounds is None:
        row_bounds = equal_band_bounds(tiles_y, n_dev)
    if rows_per_max is None:
        rows_per_max = rows_per
    if band_pair is None:
        band_pair = np.stack([np.arange(n_dev),
                              2 * n_dev - 1 - np.arange(n_dev)], 1)
    return _train_step_sharded(
        params, aux, adam, camera, gt_image, bg, lrs, cfg, loss_cfg, mesh,
        app_embedding, app_net, near_cam, gray_r, gray_n, dev_pair_capacity,
        jnp.asarray(row_bounds, jnp.int32), int(rows_per_max),
        jnp.asarray(band_pair, jnp.int32))


@partial(jax.jit,
         static_argnames=("cfg", "loss_cfg", "mesh", "dev_pair_capacity",
                          "rows_per_max"))
def _train_step_sharded(params: gm.GaussianParams, aux: gm.GaussianAux,
                        adam: gm.AdamState, camera: Camera, gt_image, bg,
                        lrs, cfg: RasterConfig, loss_cfg: LossConfig,
                        mesh: Mesh,
                        app_embedding: jax.Array | None = None,
                        app_net: dict | None = None,
                        near_cam: Camera | None = None,
                        gray_r=None, gray_n=None,
                        dev_pair_capacity: int | None = None,
                        row_bounds=None, rows_per_max: int | None = None,
                        band_pair=None):
    """Sharded train step, full parity with `train.step.train_step`:
    per-device binning + tile blend, psum'd parameter / mean2d-tap /
    appearance gradients, replicated Adam update, densification stats.

    Every loss term is computed as a psum of per-device *band* partial sums
    (not full-frame replicated), so per-chip loss FLOPs scale ~1/N:
      - L1 (all appearance kinds) over row bands of the frame,
      - SSIM over bands of valid 11x11 windows (each device's input slice
        carries the 10 halo rows below its band),
      - depth->normal consistency over bands with a 1-row halo,
      - PGSR multi-view terms band-sharded (each device samples the
        neighbour's depth for its own band; masked sums psum'd).
    Only the GOF appearance CNN (1/32-res input) runs replicated; its loss
    cotangents still arrive band-partitioned so psum'd grads stay correct.

    Returns (params, aux, adam, metrics) exactly like train_step.

    `row_bounds` (traced [n_dev+1] tile-row partition) + static
    `rows_per_max` enable equal-PAIR load-balanced bands (see
    `balance_band_bounds`); default is equal rows. A [2n+1] partition adds
    a second band per device — mirrored (d, 2n-1-d) by default, or matched
    by the traced `band_pair` [n,2] (`paired_balance_bounds`). Any valid
    partition produces identical losses/gradients."""
    n_dev = mesh.devices.size
    tiles_x, tiles_y, rows_per = _band_grid(camera, cfg, n_dev)
    if row_bounds is None:
        row_bounds = equal_band_bounds(tiles_y, n_dev)
    if rows_per_max is None:
        rows_per_max = rows_per
    num_tiles = tiles_x * tiles_y
    row_bounds = jnp.asarray(row_bounds, jnp.int32)
    if band_pair is None:
        # canonical mirrored matching — one treedef for both cases
        band_pair = np.stack([np.arange(n_dev),
                              2 * n_dev - 1 - np.arange(n_dev)], 1)
    band_pair = jnp.asarray(band_pair, jnp.int32)
    height, width = int(camera.height), int(camera.width)
    mv_on = (loss_cfg.reg_on and loss_cfg.mv_on and cfg.require_depth
             and near_cam is not None
             and (loss_cfg.lambda_mv_ncc > 0 or loss_cfg.lambda_mv_geo > 0))
    if app_embedding is None:
        app_embedding = jnp.zeros((2,))
    if app_net is None:
        app_net = {}
    if gray_r is None:
        gray_r = jnp.zeros((height, width))
    if gray_n is None:
        gray_n = jnp.zeros((height, width))
    bh = -(-height // n_dev)                   # L1 / depth-normal band rows
    hv, wv = height - 10, width - 10           # SSIM valid-window grid
    bv = -(-hv // n_dev)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
             out_specs=P(), check_vma=False)
    def run(p, aux_, gt, bg_, rb, gr, gn, emb, net, bp):
        i_dev = jax.lax.axis_index(AXIS)

        def loss_fn(p_, mean2d_offset, emb_, net_):
            scales, opac = gm.scaling_n_opacity_with_3d_filter(p_, aux_.filter_3d)
            # Preprocess sharded over GAUSSIANS: each device transforms its
            # own capacity/n_dev rows and the (small, ~24 f32/gaussian)
            # screen-space outputs are all_gathered; the gather's transpose
            # is a reduce_scatter, so the preprocess VJP also runs on the
            # local shard only. This removes the replicated t_prep Amdahl
            # term the round-3 scaling model flagged (SCALING_MODEL.json:
            # pred_efficiency 0.70 at 8 devices with preprocess+its VJP
            # ~23 ms replicated). ICI cost: ~(24+16*3)*4B*N*(n-1)/n bytes,
            # ~0.1 ms at 100k gaussians — negligible against the saving.
            cap = p_.xyz.shape[0]
            ns = -(-cap // n_dev)

            def shard_rows(x):
                if x is None:
                    return None
                pad = n_dev * ns - cap
                xp = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                return jax.lax.dynamic_slice_in_dim(xp, i_dev * ns, ns, 0)

            prep_loc = preprocess(
                shard_rows(p_.xyz), shard_rows(scales),
                shard_rows(p_.rotation), shard_rows(opac),
                shard_rows(gm.get_features(p_)),
                shard_rows(gm.get_sg_axis(p_)),
                shard_rows(gm.get_sg_sharpness(p_)),
                shard_rows(p_.sg_color),
                camera, cfg, shard_rows(aux_.alive))
            prep = jax.tree.map(
                lambda x: jax.lax.all_gather(x, AXIS, tiled=True)[:cap],
                prep_loc)
            prep = dataclasses.replace(prep, mean2d=prep.mean2d + mean2d_offset)
            dual = rb.shape[0] == 2 * n_dev + 1
            ba, bb = bp[i_dev, 0], bp[i_dev, 1]
            binning = bin_gaussians(
                prep, cfg, width, height,
                row_lo=rb[ba] if dual else rb[i_dev],
                row_hi=rb[ba + 1] if dual else rb[i_dev + 1],
                pair_capacity=dev_pair_capacity,
                row_lo2=rb[bb] if dual else None,
                row_hi2=rb[bb + 1] if dual else None)
            my_tiles = _my_band_tiles(rb, i_dev, rows_per_max, tiles_x,
                                      num_tiles, n_dev, band_pair=bp)
            local = _render_local_tiles(prep, binning, camera, cfg, bg_,
                                        my_tiles)
            full = _assemble_band_tiles(local, rb, rows_per_max, tiles_x,
                                        tiles_y, n_dev, band_pair=bp)
            img = _tiles_to_image(full["color"], tiles_x, tiles_y,
                                  width, height, cfg)

            # Differentiation protocol: `part` accumulates this device's BAND
            # partial of the global loss (local masked sums over global
            # denominators). Differentiating `part` per device and psum'ing
            # the grads afterwards yields exactly d(global loss)/d(inputs).
            # Psum'ing the *loss* before differentiating would not: the
            # transpose of a forward psum re-broadcasts cotangents, scaling
            # every gradient by n_dev. Global metric values are assembled
            # from psum'd sums as non-differentiated aux outputs.

            # --- banded L1 (appearance-aware) -------------------------------
            r0 = i_dev * bh
            if loss_cfg.appearance == "gof":
                from gsjax.model.appearance import gof_mapped
                mapped, crop_gt = gof_mapped(img, gt, net_, emb_)
                hc, wc = mapped.shape[0], mapped.shape[1]
                bhc = -(-hc // n_dev)
                r0c = i_dev * bhc
                m_b = _row_slice(mapped, r0c, bhc, n_dev * bhc)
                g_b = _row_slice(crop_gt, r0c, bhc, n_dev * bhc)
                rmask = (r0c + jnp.arange(bhc)) < hc
                l1_s = jnp.sum(jnp.where(rmask[:, None, None],
                                         jnp.abs(m_b - g_b), 0.0))
                l1_den = hc * wc * 3
            else:
                img_b = _row_slice(img, r0, bh, n_dev * bh)
                gt_b = _row_slice(gt, r0, bh, n_dev * bh)
                if loss_cfg.appearance == "gs":
                    img_b = img_b @ emb_[:3, :3].T + emb_[:3, 3]
                elif loss_cfg.appearance == "pgsr":
                    img_b = jnp.exp(emb_[0]) * img_b + emb_[1]
                rmask = (r0 + jnp.arange(bh)) < height
                l1_s = jnp.sum(jnp.where(rmask[:, None, None],
                                         jnp.abs(img_b - gt_b), 0.0))
                l1_den = height * width * 3
            ll1 = jax.lax.psum(l1_s, AXIS) / l1_den

            # --- banded SSIM (input slice = band + 10 halo rows) ------------
            r0v = i_dev * bv
            img_s = _row_slice(img, r0v, bv + 10, n_dev * bv + 10)
            gt_s = _row_slice(gt, r0v, bv + 10, n_dev * bv + 10)
            vmask = (r0v + jnp.arange(bv)) < hv
            ssim_s = losses.ssim_partial(img_s, gt_s, vmask)
            ssim_den = hv * wv * 3
            ssim_val = jax.lax.psum(ssim_s, AXIS) / ssim_den

            part = (1 - loss_cfg.lambda_dssim) * l1_s / l1_den - \
                loss_cfg.lambda_dssim * ssim_s / ssim_den
            total = (1 - loss_cfg.lambda_dssim) * ll1 + \
                loss_cfg.lambda_dssim * (1 - ssim_val)

            dn_loss = jnp.zeros(())
            ncc_l = geo_l = jnp.zeros(())
            need_geom = loss_cfg.reg_on and cfg.require_depth and (
                loss_cfg.lambda_depth_normal > 0 or mv_on)
            if need_geom:
                depth = _tiles_to_image(full["median_depth"], tiles_x, tiles_y,
                                        width, height, cfg)
                nrm = _tiles_to_image(full["normal"], tiles_x, tiles_y,
                                      width, height, cfg)
            if (loss_cfg.reg_on and loss_cfg.lambda_depth_normal > 0
                    and cfg.require_depth):
                # banded depth->normal with a 1-row halo each side; boundary
                # rows disagree with the full-frame path only where
                # valid=False, so the masked loss matches exactly
                dpad = jnp.pad(depth, ((1, n_dev * bh + 1 - height), (0, 0)))
                d_s = jax.lax.dynamic_slice_in_dim(dpad, r0, bh + 2, 0)
                dn_s, dv_s = losses.depth_to_normal(
                    d_s, camera.fx, camera.fy, camera.cx,
                    camera.cy - (r0 - 1).astype(jnp.float32))
                dnormal_b, dvalid_b = dn_s[1:-1], dv_s[1:-1]
                nrm_b = _row_slice(nrm, r0, bh, n_dev * bh)
                rmask = (r0 + jnp.arange(bh)) < height
                err = 1.0 - jnp.sum(nrm_b * dnormal_b, axis=-1)
                dsum = jnp.sum(jnp.where(dvalid_b & rmask[:, None], err, 0.0))
                dn_loss = jax.lax.psum(dsum, AXIS) / (height * width)
                part = part + loss_cfg.lambda_depth_normal * \
                    dsum / (height * width)
                total = total + loss_cfg.lambda_depth_normal * dn_loss
            if mv_on:
                from gsjax.train.multiview import patchmatch_terms
                # this device's horizontal band (pad rows -> depth 0 -> masked)
                dep_b = _row_slice(depth, r0, bh, n_dev * bh)
                nrm_mv = _row_slice(nrm, r0, bh, n_dev * bh)
                (ncc_s, ncc_c, geo_s, geo_c, _win_rej, _mv_q,
                 _mv_b) = patchmatch_terms(
                    dep_b, nrm_mv, p_.xyz, scales, p_.rotation, opac,
                    aux_.alive, camera, near_cam, gr, gn, cfg,
                    loss_cfg.pixel_noise_th, loss_cfg.patch_size,
                    row_offset=r0)
                # counts are stop_gradient'd masks -> global denominators are
                # constants wrt autodiff
                ncc_c = jax.lax.psum(ncc_c, AXIS)
                geo_c = jax.lax.psum(geo_c, AXIS)
                any_mask = geo_c > 0
                ncc_gs = jax.lax.psum(ncc_s, AXIS)
                geo_gs = jax.lax.psum(geo_s, AXIS)
                ncc_l = jnp.where(any_mask,
                                  ncc_gs / jnp.maximum(ncc_c, 1), 0.0)
                geo_l = jnp.where(any_mask,
                                  geo_gs / jnp.maximum(geo_c, 1), 0.0)
                anyf = any_mask.astype(jnp.float32)
                part = part + loss_cfg.lambda_mv_ncc * anyf * \
                    ncc_s / jnp.maximum(ncc_c, 1) \
                    + loss_cfg.lambda_mv_geo * anyf * \
                    geo_s / jnp.maximum(geo_c, 1)
                total = total + loss_cfg.lambda_mv_ncc * ncc_l \
                    + loss_cfg.lambda_mv_geo * geo_l

            metrics = dict(
                loss=total, l1=ll1, ssim=ssim_val, dn_loss=dn_loss,
                ncc_loss=ncc_l, geo_loss=geo_l,
                num_pairs=jax.lax.psum(binning.num_pairs, AXIS),
                num_live_pairs=jax.lax.pmax(binning.num_live, AXIS),
                dev_num_pairs=jax.lax.pmax(binning.num_pairs, AXIS),
                max_tile_count=jax.lax.pmax(binning.max_tile_count, AXIS),
                # per-tile-row global pair counts: bands are disjoint and
                # out-of-band tiles report 0, so the psum is the exact global
                # histogram — the host's input for balance_band_bounds
                row_pairs=jax.lax.psum(
                    binning.tile_count.reshape(tiles_y, tiles_x).sum(axis=1),
                    AXIS))
            side = dict(visibility=prep.radius > 0, radii=prep.radius)
            return part, (jax.lax.stop_gradient(metrics), side)

        zeros2d = jnp.zeros((p.capacity, 2))
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3),
                                     has_aux=True)
        (_, (metrics, side)), (gp, g2d, g_emb, g_net) = grad_fn(
            p, zeros2d, emb, net)
        # every loss term is a psum of band partials, so each device's grad is
        # its band's contribution; psum completes the reduction over the mesh.
        #
        # On overlapping these psums with the backward (the classic
        # grad-reduce/compute overlap): not worth engineering here. Every
        # parameter gradient materialises only at the END of the backward
        # (the blend VJP scatters per-pair grads into per-gaussian rows as
        # its final stage), so there is no early-ready bucket to ship; and
        # the full gradient payload is ~capacity x 59 f32 ~ 24 MB at 100k
        # gaussians — ~0.25 ms on ~100 GB/s ICI against a ~100+ ms backward
        # (<1%). XLA's async collective scheduler already hides that tail.
        # Overlap would only matter if the backward were chunked into
        # per-parameter stages, which would defeat the single-pass tile
        # traversal that makes it fast.
        psum = lambda g: jax.lax.psum(g, AXIS)
        gp = jax.tree_util.tree_map(psum, gp)
        g2d = psum(g2d)
        g_emb = psum(g_emb)
        g_net = jax.tree_util.tree_map(psum, g_net)

        def _mask(g):
            m = aux_.alive.reshape((-1,) + (1,) * (g.ndim - 1))
            return jnp.where(m, g, 0.0)
        gp = jax.tree_util.tree_map(_mask, gp)
        g2d = _mask(g2d)
        return metrics, side, gp, g2d, g_emb, g_net

    metrics, side, gp, g2d, g_emb, g_net = run(
        params, aux, gt_image, bg, row_bounds, gray_r, gray_n,
        app_embedding, app_net, band_pair)
    metrics["app_grad"] = g_emb
    metrics["app_net_grad"] = g_net
    aux = gm.add_densification_stats(aux, g2d, side["visibility"],
                                     width, height)
    aux = dataclasses.replace(
        aux, max_radii=jnp.maximum(
            aux.max_radii, jnp.where(side["visibility"], side["radii"], 0)))
    params, adam = gm.adam_update(params, gp, adam, lrs)
    return params, aux, adam, metrics
