"""Training driver: the 30k-iteration loop.

Mirrors `training()` (train.py:41-270): camera sampling, SH/SG degree
schedule, densification + opacity-reset schedule, 3D-filter refresh, test
evaluation and checkpointing — plus the capacity management that replaces the
reference's dynamic reallocations: pair-buffer / per-tile / gaussian
capacities are power-of-two buckets bumped (with a recompile) when high-water
marks approach them.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.data.readers import SceneInfo, build_nearest_view_graph, load_scene
from gsjax.model import appearance as app_lib
from gsjax.model import gaussians as gm
from gsjax.model.io import load_checkpoint, save_checkpoint, save_ply
from gsjax.ops.knn import mean_knn_dist2
from gsjax.ops.raster import RasterConfig, render
from gsjax.train import losses
from gsjax.train.step import LossConfig, train_step
from gsjax.utils.schedules import expon_lr

APPEARANCE_KINDS = {0: "no", 1: "gs", 2: "gof", 3: "pgsr"}


def next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


MV_CAP_FLOOR = 1 << 14


def mv_shrink_target(watermark_max: int, capacity: int,
                     floor: int = MV_CAP_FLOOR) -> int | None:
    """Shrunk mv_query bucket for a settled watermark, or None to keep.

    sample_depth's cost scales with its static row count, and real scenes
    settle FAR below the half-frame auto-init (the 1080p bench: 48k valid
    queries vs the 2^20 bucket — profile_mv_r5: 546 -> 389 ms/step at the
    right bucket). Shrink to pow2(1.3 x the recent watermark max), floored;
    only worth a recompile when that at least halves the bucket. The 1.3
    headroom matches the grow path; oscillation is bounded by the caller's
    30-step window, the halving requirement, and the loss-free overflow
    retry (a shrink can never train a truncated step)."""
    tgt = max(next_pow2(int(watermark_max * 1.3) + 1), floor)
    return tgt if tgt <= capacity // 2 else None


@dataclasses.dataclass
class Trainer:
    scene: SceneInfo
    params: gm.GaussianParams
    aux: gm.GaussianAux
    adam: gm.AdamState
    app: app_lib.AppearanceState
    opt: "object"              # OptimizationParams namespace
    model_path: str
    kernel_size: float = 0.0
    white_background: bool = False
    disable_filter3d: bool = False
    sh_degree: int = 3
    sg_degree: int = 0
    active_sh: int = 0
    active_sg: int = 0
    pair_capacity: int = 1 << 18
    live_capacity: int = 1 << 17
    max_per_tile: int = 1 << 10
    # static sample_depth query budget for the PGSR geometric loss (0 =
    # auto-init to half the frame on the first multi-view step; compaction
    # is loss-exact, see gsjax/train/multiview.py). GSJAX_MV_COMPACT=0
    # reverts to one query per pixel (dense).
    mv_query_capacity: int = 0
    # static 16x16-block budget for the block-compacted NCC
    # (GSJAX_NCC_COMPACT=1; 0 = auto-init to half the frame's blocks).
    # Watermark-bumped/shrunk like mv_query_capacity via
    # metrics["mv_blocks"].
    ncc_block_capacity: int = 0
    iteration: int = 0
    key: jax.Array = None
    # multi-chip: tiles sharded over `mesh` (None = single-device step);
    # each device bins only its own row band into a dev_pair_capacity buffer
    mesh: "object" = None
    dev_pair_capacity: int = 1 << 16
    # equal-PAIR band balancing: per-tile-row pair histograms (EMA, keyed by
    # tiles_y so multi-resolution scenes don't mix) feed
    # balance_band_bounds; rows_factor bounds a band at factor x the
    # equal-rows height (static Pallas grid size). GSJAX_BAND_BALANCE=0
    # reverts to equal-row bands.
    band_balance: bool = os.environ.get("GSJAX_BAND_BALANCE", "1") not in ("0", "")
    band_rows_factor: float = float(os.environ.get("GSJAX_BAND_ROWS_FACTOR", "2"))
    # mirrored dual bands per device (pair-dense centre + sparse edge)
    dual_bands: bool = os.environ.get("GSJAX_DUAL_BANDS", "1") not in ("0", "")
    _row_pairs: dict = dataclasses.field(default_factory=dict)
    random_background: bool = False
    # device-resident gt cache: without it every step re-uploads the frame
    # (24 MB at 1080p) host->device — expensive over thin transports and
    # pure waste on repeats. LRU bounded in BYTES (a view-count bound blows
    # up at 4K: 64 x 100 MB would OOM a 16 GB chip); keyed by image_name
    # (train uids are renumbered 0..N-1 while test views keep their raw
    # index, so uid collides across splits — readers.py:146).
    gt_cache_bytes: int = 512 * 1024 * 1024
    _gt_cache: dict = dataclasses.field(default_factory=dict)
    debug: bool = False   # write gt/render/normal/depth mosaics (PatchMatch
    #                       debug dumps, loss_utils.py:201-221)
    # NaN root-cause probe (GSJAX_NAN_PROBE=1): per-param non-finite counts
    # computed inside the jitted step; on the FIRST step where an alive
    # gaussian goes non-finite, the PRE-step state + view ids are dumped so
    # scripts/nan_hunt.py can replay that exact step under jax_debug_nans.
    nan_probe: bool = os.environ.get("GSJAX_NAN_PROBE", "") not in ("", "0")
    _nan_dumps: int = 0
    # rolling mv_queries / mv_blocks watermarks since the last capacity
    # change; feed the shrink policy (mv_shrink_target)
    _mv_wm: list = dataclasses.field(default_factory=list)
    _blk_wm: list = dataclasses.field(default_factory=list)

    @staticmethod
    def create(scene: SceneInfo, opt, model_path, sh_degree=3, sg_degree=0,
               kernel_size=0.0, white_background=False, disable_filter3d=False,
               appearance="no", seed=0):
        knn = mean_knn_dist2(scene.points)
        capacity = next_pow2(int(scene.points.shape[0] * 1.5) + 1)
        params, aux = gm.init_from_pcd(scene.points, scene.colors, capacity,
                                       sh_degree, sg_degree, knn, seed=seed)
        # per-camera max-scale clamp 0.05 * dist (scene/__init__.py:125-131)
        scaling = np.asarray(params.scaling)
        xyz = np.asarray(params.xyz)
        for v in scene.train_views:
            d = np.linalg.norm(xyz - v.camera_center[None, :], axis=1)
            scaling = np.minimum(scaling, np.log(np.maximum(0.05 * d, 1e-12))[:, None])
        params = dataclasses.replace(params, scaling=jnp.asarray(scaling))
        adam = gm.adam_init(params)
        app = app_lib.init_appearance(appearance, len(scene.train_views), seed)
        t = Trainer(scene=scene, params=params, aux=aux, adam=adam, app=app,
                    opt=opt, model_path=model_path, kernel_size=kernel_size,
                    white_background=white_background,
                    disable_filter3d=disable_filter3d,
                    sh_degree=sh_degree, sg_degree=sg_degree,
                    key=jax.random.PRNGKey(seed))
        t.refresh_filter3d()
        return t

    # --- helpers -------------------------------------------------------------

    def camera_stack(self):
        views = self.scene.train_views
        return (jnp.stack([np.asarray(v.camera.world_view) for v in views]),
                jnp.stack([np.asarray(v.camera.fx) for v in views]),
                jnp.stack([np.asarray(v.camera.fy) for v in views]),
                jnp.asarray([v.width for v in views], jnp.float32),
                jnp.asarray([v.height for v in views], jnp.float32))

    def refresh_filter3d(self):
        if self.disable_filter3d:
            filt = jnp.zeros((self.params.capacity,))
        else:
            wv, fx, fy, w, h = self.camera_stack()
            filt = gm.compute_3d_filter(self.params.xyz, self.aux.alive,
                                        wv, fx, w, h, fy)
        self.aux = dataclasses.replace(self.aux, filter_3d=filt)

    def raster_cfg(self, require_depth: bool) -> RasterConfig:
        return RasterConfig(
            sh_degree=self.active_sh, sg_degree=self.active_sg,
            kernel_size=self.kernel_size, require_depth=require_depth,
            pair_capacity=self.pair_capacity,
            live_capacity=min(self.live_capacity, self.pair_capacity),
            max_per_tile=self.max_per_tile,
            backend=os.environ.get("GSJAX_RASTER_BACKEND", "auto"))

    def lrs(self):
        o = self.opt
        sp = self.scene.radius
        return dict(
            xyz=expon_lr(self.iteration, o.position_lr_init * sp,
                         o.position_lr_final * sp,
                         lr_delay_mult=o.position_lr_delay_mult,
                         max_steps=o.position_lr_max_steps),
            features_dc=o.feature_dc_lr, features_rest=o.feature_rest_lr,
            opacity=o.opacity_lr, scaling=o.scaling_lr, rotation=o.rotation_lr,
            sg_axis=o.sg_axis_lr, sg_sharpness=o.sg_sharpness_lr,
            sg_color=o.sg_color)

    def bg(self):
        return jnp.ones(3) if self.white_background else jnp.zeros(3)

    def gt_for(self, view):
        """Masked/bg-composited gt frame on device, LRU-cached.

        Masked scenes compose with the STATIC background (matching the
        reference, which bakes `image * mask` at load); under
        `random_background` the masked-out region therefore still compares
        against the static bg, same as the reference's masked datasets.
        """
        key = view.image_name
        cached = self._gt_cache.pop(key, None)        # pop+reinsert = LRU
        if cached is None:
            cached = jnp.asarray(view.image)
            if view.mask is not None:
                m = (view.mask > 0.5).astype(np.float32)[..., None]
                cached = cached * m + self.bg()[None, None, :] * (1 - m)
            frame_bytes = int(np.prod(cached.shape)) * 4
            max_n = max(1, self.gt_cache_bytes // max(frame_bytes, 1))
            while len(self._gt_cache) >= max_n:
                self._gt_cache.pop(next(iter(self._gt_cache)))
        self._gt_cache[key] = cached
        return cached

    @property
    def sharded(self) -> bool:
        return self.mesh is not None and self.mesh.devices.size > 1

    def band_kwargs(self, camera, cfg, uid=None) -> dict:
        """row_bounds/rows_per_max for the sharded step: equal-pair bands
        re-chosen each step from per-row pair histograms (traced inputs —
        rebalancing never recompiles; one program per (tiles_y,
        rows_per_max)). A view's own histogram from its last visit is used
        when available (near-exact balance; the model drifts slowly between
        visits); otherwise the scene-level EMA; otherwise equal rows."""
        if not (self.sharded and self.band_balance):
            return {}
        from gsjax.parallel import balance_band_bounds, equal_band_bounds
        n = int(self.mesh.devices.size)
        _, tiles_y = cfg.grid(camera.width, camera.height)
        rows_per = -(-tiles_y // n)
        rpm = min(tiles_y,
                  max(rows_per, int(np.ceil(self.band_rows_factor * rows_per))))
        hist = self._row_pairs.get((uid, tiles_y),
                                   self._row_pairs.get(tiles_y))
        if hist is None:
            return dict(row_bounds=equal_band_bounds(tiles_y, n),
                        rows_per_max=rpm)
        # best of: single contiguous equal-pair bands vs dual bands ([2n+1]
        # bounds, two row intervals per device). Dual cuts the
        # row-quantisation share_max (SCALING_MODEL_r04: 0.191 equal-rows ->
        # 0.141 at 8 devices); round 5 adds FREE band matching
        # (paired_balance_bounds) — the mirrored (d, 2n-1-d) pairing couples
        # the two centre bands on centre-heavy scenes (share_max 0.076 vs
        # ideal 0.0625 at 16 devices).
        bounds, pair = balance_band_bounds(hist, n, rpm), None
        h = np.asarray(hist, np.float64)
        cum = np.concatenate([[0.0], np.cumsum(h)])
        best = max(cum[bounds[d + 1]] - cum[bounds[d]] for d in range(n))
        if self.dual_bands and tiles_y >= 2 * n:
            from gsjax.parallel import (dual_balance_bounds,
                                        paired_balance_bounds)
            b2 = dual_balance_bounds(hist, n, max(rpm // 2, 1))
            s2 = max(cum[b2[d + 1]] - cum[b2[d]] +
                     cum[b2[2 * n - d]] - cum[b2[2 * n - 1 - d]]
                     for d in range(n))
            if s2 < best:
                bounds, pair, best = b2, None, s2
            b3, p3 = paired_balance_bounds(hist, n, rpm)
            s3 = max(cum[b3[p3[d, 0] + 1]] - cum[b3[p3[d, 0]]] +
                     cum[b3[p3[d, 1] + 1]] - cum[b3[p3[d, 1]]]
                     for d in range(n))
            if s3 < best:
                bounds, pair, best = b3, p3, s3
        return dict(row_bounds=bounds, rows_per_max=rpm, band_pair=pair)

    def note_row_pairs(self, metrics, uid=None):
        """Record this step's per-row pair histogram: exact per-view (keyed
        (uid, tiles_y)) plus a scene-level EMA fallback for unvisited views."""
        if "row_pairs" not in metrics:
            return
        new = np.asarray(metrics["row_pairs"], np.float64)
        if uid is not None:
            self._row_pairs[(uid, len(new))] = new
        old = self._row_pairs.get(len(new))
        self._row_pairs[len(new)] = \
            new if old is None or len(old) != len(new) \
            else 0.7 * old + 0.3 * new

    def overflowed(self, metrics) -> bool:
        """True when this step's binning dropped pairs (buffers too small):
        the step trained on a truncated pair list and must be retried after
        bumping (binning truncates at pair_capacity, the kernels clamp tiles
        at max_per_tile)."""
        if int(metrics["max_tile_count"]) > self.max_per_tile:
            return True
        if int(metrics.get("num_live_pairs", 0)) > self.live_capacity:
            return True
        if self.mv_query_capacity and \
                int(metrics.get("mv_queries", 0)) > self.mv_query_capacity:
            return True   # compacted query list truncated valid pixels
        if self.ncc_block_capacity and \
                int(metrics.get("mv_blocks", 0)) > self.ncc_block_capacity:
            return True   # compacted NCC block list truncated masked blocks
        if self.sharded:
            return int(metrics["dev_num_pairs"]) > self.dev_pair_capacity
        return int(metrics["num_pairs"]) > self.pair_capacity

    def monitor_capacity(self, metrics):
        """Bump static buckets when high-water marks approach them.

        Growth factors are coarse (x2.5-3 before pow2 rounding) on purpose:
        every bump recompiles the train step (the reg-phase program costs
        minutes on TPU), so fewer, bigger jumps beat tight sizing. Memory is
        cheap relative — a pair slot is 16 floats. An overflow (watermark
        already crossed) always triggers the corresponding bump, so the
        overflow-retry path in step() reuses this."""
        recompiled = False
        if self.sharded:
            npairs = int(metrics["dev_num_pairs"])
            if npairs > 0.85 * self.dev_pair_capacity:
                self.dev_pair_capacity = next_pow2(int(npairs * 3.0))
                recompiled = True
        # the GLOBAL watermark always tracks pair_capacity: even when the
        # train step uses per-device band buffers, full-frame renders
        # (eval, viewer, mesh extraction) bin with pair_capacity and would
        # silently truncate once the model outgrows it
        npairs = int(metrics["num_pairs"])
        if npairs > 0.85 * self.pair_capacity:
            self.pair_capacity = next_pow2(int(npairs * 3.0))
            recompiled = True
        nlive = int(metrics.get("num_live_pairs", 0))
        if nlive > 0.85 * self.live_capacity:
            self.live_capacity = next_pow2(int(nlive * 3.0))
            recompiled = True
        mtc = int(metrics["max_tile_count"])
        if mtc > 0.9 * self.max_per_tile:
            self.max_per_tile = next_pow2(int(mtc * 2.5))
            recompiled = True
        nq = int(metrics.get("mv_queries", 0))
        if self.mv_query_capacity and nq > 0.9 * self.mv_query_capacity:
            # queries are bounded by the frame size, so growth is gentler
            # than the pair buckets (x1.3 before pow2 rounding) and clamps
            # at the largest frame (capacity beyond q buys nothing)
            qmax = max(v.width * v.height for v in self.scene.train_views)
            self.mv_query_capacity = min(next_pow2(int(nq * 1.3)),
                                         next_pow2(qmax))
            self._mv_wm.clear()
            recompiled = True
        elif self.mv_query_capacity and nq > 0:
            # shrink the bucket once 30 consecutive views settle far below
            # it (the half-frame auto-init overshoots by >20x on real
            # scenes; sample_depth cost scales with the static row count)
            self._mv_wm.append(nq)
            if len(self._mv_wm) >= 30:
                tgt = mv_shrink_target(max(self._mv_wm),
                                       self.mv_query_capacity)
                self._mv_wm.clear()
                if tgt is not None:
                    self.mv_query_capacity = tgt
                    recompiled = True
        nb = int(metrics.get("mv_blocks", 0))
        if self.ncc_block_capacity and nb > 0.9 * self.ncc_block_capacity:
            self.ncc_block_capacity = next_pow2(int(nb * 1.3))
            self._blk_wm.clear()
            recompiled = True
        elif self.ncc_block_capacity and nb > 0:
            self._blk_wm.append(nb)
            if len(self._blk_wm) >= 30:
                tgt = mv_shrink_target(max(self._blk_wm),
                                       self.ncc_block_capacity, floor=256)
                self._blk_wm.clear()
                if tgt is not None:
                    self.ncc_block_capacity = tgt
                    recompiled = True
        n_alive = int(jnp.sum(self.aux.alive))
        if n_alive > 0.9 * self.params.capacity:
            self.params, self.aux, self.adam = gm.grow_capacity(
                self.params, self.aux, self.adam,
                next_pow2(int(self.params.capacity * 2.5)))
            recompiled = True
        return recompiled

    # --- main loop -----------------------------------------------------------

    def step(self):
        self.iteration += 1
        it = self.iteration
        o = self.opt

        if it % 1000 == 0:
            self.active_sh = min(self.active_sh + 1, self.sh_degree)
            self.active_sg = self.sg_degree  # unlockSGdegree(100), train.py:127-130

        view = random.choice(self.scene.train_views)
        reg_on = it >= o.regularization_from_iter
        near = None
        if reg_on and view.nearest_ids and (
                o.lambda_multi_view_ncc > 0 or o.lambda_multi_view_geo > 0):
            near = self.scene.train_views[random.choice(view.nearest_ids)]
        mv_cap = None
        if near is not None and \
                os.environ.get("GSJAX_MV_COMPACT", "1") not in ("0", ""):
            if self.mv_query_capacity == 0:
                self.mv_query_capacity = next_pow2(
                    (view.width * view.height) // 2)
            mv_cap = self.mv_query_capacity
        blk_cap = None
        if mv_cap is not None and \
                os.environ.get("GSJAX_NCC_COMPACT", "0") not in ("0", ""):
            if self.ncc_block_capacity == 0:
                nb = -(-view.height // 16) * (-(-view.width // 16))
                self.ncc_block_capacity = next_pow2(nb // 2)
            blk_cap = self.ncc_block_capacity
        cfg = self.raster_cfg(require_depth=reg_on)
        lcfg = LossConfig(
            lambda_dssim=o.lambda_dssim,
            lambda_depth_normal=o.lambda_depth_normal,
            lambda_mv_ncc=o.lambda_multi_view_ncc,
            lambda_mv_geo=o.lambda_multi_view_geo,
            reg_on=reg_on, mv_on=near is not None,
            pixel_noise_th=o.multi_view_pixel_noise_th,
            patch_size=o.multi_view_patch_size,
            appearance=self.app.kind,
            # sharded steps keep the dense band formulation for now (bands
            # already shrink the per-device query count ~1/N)
            mv_query_capacity=None if self.sharded else mv_cap,
            ncc_block_capacity=None if self.sharded else blk_cap,
            nan_stats=self.nan_probe)
        if self.nan_probe:
            prev_state = (self.params, self.aux, self.adam)

        emb = self.app.table[view.uid] if self.app.table is not None else None
        if self.random_background:
            # train.py:91: random bg decorrelates background from geometry
            self.key, kbg = jax.random.split(self.key)
            bg = jax.random.uniform(kbg, (3,))
        else:
            bg = self.bg()
        common = dict(
            app_embedding=emb, app_net=self.app.net,
            near_cam=near.camera if near is not None else None,
            gray_r=jnp.asarray(view.gray) if near is not None else None,
            gray_n=jnp.asarray(near.gray) if near is not None else None)

        # Overflow-retry: the step is functional, so if this view's binning
        # outgrew the static buffers (pairs truncated -> dropped gradients)
        # we discard the returned state, bump capacities (recompile) and
        # re-run the SAME view loss-free — no step ever trains truncated.
        for _attempt in range(4):
            if self.sharded:
                from gsjax.parallel import train_step_sharded
                p2, aux2, adam2, metrics = train_step_sharded(
                    self.params, self.aux, self.adam, view.camera,
                    self.gt_for(view), bg, self.lrs(), cfg, lcfg, self.mesh,
                    dev_pair_capacity=self.dev_pair_capacity,
                    **self.band_kwargs(view.camera, cfg, view.uid), **common)
            else:
                p2, aux2, adam2, metrics = train_step(
                    self.params, self.aux, self.adam, view.camera,
                    self.gt_for(view), bg, self.lrs(), cfg, lcfg, **common)
            if _attempt == 0:
                # The step above is dispatched but not finished: predict the
                # NEXT step's view by peeking the random stream (state is
                # restored, so the real draw reproduces it — no stream shift,
                # resume stays bit-identical) and start its gt upload, an
                # async device_put, under this step's compute. Only matters
                # on LRU misses, i.e. scenes whose frames outgrow
                # gt_cache_bytes.
                st = random.getstate()
                nxt = random.choice(self.scene.train_views)
                random.setstate(st)
                self.gt_for(nxt)
            # ONE bulk device->host fetch: the bookkeeping below reads many
            # scalars (overflow watermarks, loss, mv/nan counters, row
            # histogram) and each separate int()/float() is a full relay
            # round-trip — the blobs r5 run measured 1075 ms/iter of host
            # glue against a 70 ms device step, dominated by exactly these
            # reads. device_get also serves as the step's blocking fence.
            metrics = jax.device_get(metrics)
            if not self.overflowed(metrics):
                break
            self.monitor_capacity(metrics)   # grows the overflowed bucket
            cfg = self.raster_cfg(require_depth=reg_on)
        else:
            # 4 bumps is a >40x capacity jump; if that still overflows,
            # surface it — this step trained on truncated pairs
            print(f"WARNING: iteration {it} still overflowed after retries "
                  f"(pairs {int(metrics['num_pairs'])} > cap "
                  f"{self.pair_capacity}); trained truncated", flush=True)
        self.params, self.aux, self.adam = p2, aux2, adam2
        self.note_row_pairs(metrics, view.uid)

        if self.nan_probe and "nonfinite" in metrics:
            nf = {f"{k}.{f}": int(v)
                  for k, d in metrics["nonfinite"].items()
                  for f, v in d.items()}
            if any(nf.values()) and self._nan_dumps < 3:
                self._nan_dumps += 1
                path = os.path.join(self.model_path,
                                    f"nan_probe_it{it}.npz")
                flat = {}
                for name, tree in (("params", prev_state[0]),
                                   ("aux", prev_state[1]),
                                   ("adam_mu", prev_state[2].mu),
                                   ("adam_nu", prev_state[2].nu)):
                    for fld in dataclasses.fields(type(tree)):
                        flat[f"{name}.{fld.name}"] = np.asarray(
                            getattr(tree, fld.name))
                flat["adam.count"] = np.asarray(prev_state[2].count)
                flat["view_uid"] = np.asarray(view.uid)
                flat["near_uid"] = np.asarray(
                    -1 if near is None else near.uid)
                flat["iteration"] = np.asarray(it)
                flat["active_sh"] = np.asarray(self.active_sh)
                flat["active_sg"] = np.asarray(self.active_sg)
                np.savez_compressed(path, **flat)
                print(f"NAN_PROBE: iteration {it} produced non-finite "
                      f"values {sorted(k for k, v in nf.items() if v)} "
                      f"(counts {nf}); pre-step state dumped to {path}",
                      flush=True)

        if self.debug and reg_on and it % 200 == 0:
            self._dump_debug_mosaic(view, it)

        # debug snapshot on blow-up (equivalent of the reference's
        # snapshot_fw.dump on CUDA exception,
        # diff_gaussian_rasterization/__init__.py:101-107): dump the exact
        # state + view so the step is replayable offline
        if not np.isfinite(float(metrics["loss"])):
            path = os.path.join(self.model_path, f"snapshot_it{it}.npz")
            flat = {}
            for name, tree in (("params", self.params), ("aux", self.aux)):
                for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
                    flat[f"{name}_{i}"] = np.asarray(leaf)
            flat["view_uid"] = np.asarray(view.uid)
            flat["near_uid"] = np.asarray(-1 if near is None else near.uid)
            flat["iteration"] = np.asarray(it)
            np.savez_compressed(path, **flat)
            raise FloatingPointError(
                f"non-finite loss at iteration {it} "
                f"(view {view.image_name}); state dumped to {path}")

        # appearance optimiser
        if self.app.kind != "no":
            if self.app.kind == "gs":
                lr = expon_lr(it, o.gs_appearance_lr_init, o.gs_appearance_lr_final,
                              lr_delay_steps=o.gs_appearance_lr_delay_steps,
                              lr_delay_mult=o.gs_appearance_lr_delay_mult,
                              max_steps=o.iterations)
            elif self.app.kind == "pgsr":
                lr = o.pgsr_appearance_lr
            else:
                lr = o.appearance_embeddings_lr
            self.app = app_lib.update_table(self.app, view.uid,
                                            metrics["app_grad"], lr)
            if self.app.kind == "gof":
                net, net_opt = app_lib.adam_tree(
                    self.app.net, metrics["app_net_grad"], self.app.net_opt,
                    o.appearance_network_lr)
                self.app = dataclasses.replace(self.app, net=net, net_opt=net_opt)

        # densification schedule (train.py:233-258)
        if it < o.densify_until_iter:
            if it > o.densify_from_iter and it % o.densification_interval == 0:
                self.key, k = jax.random.split(self.key)
                self.params, self.aux, self.adam, dstats = gm.densify_and_prune(
                    self.params, self.aux, self.adam, k,
                    o.densify_grad_threshold, 0.05,
                    jnp.asarray(self.scene.radius), o.percent_dense)
                metrics["densify"] = {k2: int(v) for k2, v in dstats.items()}
                self.refresh_filter3d()
            if it % o.opacity_reset_interval == 0 or (
                    self.white_background and it == o.densify_from_iter):
                self.params, self.adam = gm.reset_opacity(
                    self.params, self.aux, self.adam)
        elif it % 100 == 0 and not self.disable_filter3d and \
                it < o.iterations - 100:
            self.refresh_filter3d()

        self.monitor_capacity(metrics)
        return metrics

    # --- eval / io -----------------------------------------------------------

    def render_view(self, view, require_depth=True, min_opacity=0.0):
        return self.render_camera(view.camera, require_depth=require_depth,
                                  min_opacity=min_opacity)

    def render_camera(self, camera, scaling_modifier=1.0, require_depth=True,
                      min_opacity=0.0):
        """Render an arbitrary camera (viewer path). scaling_modifier
        multiplies post-activation scales dynamically (no recompile per
        slider value, unlike the static cfg.scale_modifier). min_opacity > 0
        drops low-filtered-opacity gaussians (floater suppression for
        mesh-extraction depth renders)."""
        cfg = self.raster_cfg(require_depth)
        scales, opac = gm.scaling_n_opacity_with_3d_filter(self.params,
                                                           self.aux.filter_3d)
        if scaling_modifier != 1.0:
            scales = scales * jnp.float32(scaling_modifier)
        alive = self.aux.alive
        if min_opacity > 0.0:
            alive = alive & (opac[:, 0] >= min_opacity)
        return render(self.params.xyz, scales, self.params.rotation, opac,
                      gm.get_features(self.params), camera, cfg, self.bg(),
                      sg_axis=gm.get_sg_axis(self.params),
                      sg_sharpness=gm.get_sg_sharpness(self.params),
                      sg_color=self.params.sg_color, alive=alive)

    def _dump_debug_mosaic(self, view, it):
        """2x2 gt | render / normal | depth mosaic every 200 reg iterations
        (the reference's PatchMatch debug dumps, loss_utils.py:201-221,
        minus the warp-weight pane which lives inside the jitted step)."""
        from PIL import Image

        from gsjax.utils.trajectories import apply_depth_colormap

        out = self.render_view(view, require_depth=True)
        gt = np.clip(np.asarray(self.gt_for(view)), 0, 1)
        img = np.clip(np.asarray(out["render"]), 0, 1)
        nrm = np.clip((np.asarray(out["normal"]) + 1) * 0.5, 0, 1)
        dep = apply_depth_colormap(  # -> uint8; back to [0,1] for the concat
            np.asarray(out["median_depth"])).astype(np.float32) / 255.0
        mosaic = np.concatenate([np.concatenate([gt, img], axis=1),
                                 np.concatenate([nrm, dep], axis=1)], axis=0)
        dbg = os.path.join(self.model_path, "debug")
        os.makedirs(dbg, exist_ok=True)
        Image.fromarray((mosaic * 255).astype(np.uint8)).save(
            os.path.join(dbg, f"{it:05d}_{view.image_name}.jpg"))

    def evaluate(self, views, max_views=None):
        psnrs = []
        for v in views[:max_views]:
            out = self.render_view(v, require_depth=False)
            img = jnp.clip(out["render"], 0, 1)
            psnrs.append(float(losses.psnr(img, self.gt_for(v))))
        return float(np.mean(psnrs)) if psnrs else float("nan")

    def save_model(self):
        path = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{self.iteration}", "point_cloud.ply")
        save_ply(path, self.params, self.aux)

    def save_ckpt(self):
        # full appearance state (table + GOF net + both Adam states), matching
        # the reference capture() contents (scene/gaussian_model.py:88-113)
        extra = app_lib.state_to_arrays(self.app)
        save_checkpoint(os.path.join(self.model_path, f"chkpnt{self.iteration}.npz"),
                        self.params, self.aux, self.adam, self.iteration, extra)


def serve_viewer(gui, trainer: Trainer, source_path: str, final_iter: int):
    """Serve one viewer exchange round (reference train.py:93-120): receive a
    camera, render it at the requested scaling modifier, send the RGB bytes +
    the source-path verify string; loop while the client wants us paused
    (keep_alive semantics). Socket errors drop the connection silently."""
    from gsjax.ops.raster.camera import Camera

    if gui.conn is None:
        gui.try_connect()
    while gui.conn is not None:
        try:
            cam_d, do_training, keep_alive, scaling_mod = gui.receive()
            img_bytes = None
            if cam_d is not None:
                cam = Camera.from_matrices(
                    cam_d["width"], cam_d["height"], cam_d["fovx"],
                    cam_d["fovy"], cam_d["world_view"], cam_d["full_proj"])
                out = trainer.render_camera(cam, scaling_modifier=scaling_mod,
                                            require_depth=False)
                img_bytes = np.asarray(
                    jnp.clip(out["render"], 0, 1) * 255).astype(np.uint8)
            gui.send(img_bytes, source_path)
            if do_training and (trainer.iteration < final_iter
                                or not keep_alive):
                break
        except Exception:
            gui.disconnect()


def run_training(lp, op, pp, args):
    """Full CLI training entry (mirrors train.py:__main__ + training())."""
    from gsjax.parallel.multihost import is_primary, maybe_init_distributed
    maybe_init_distributed(args)   # must precede any other JAX usage
    # in a multi-process run every host executes the same (replicated-model)
    # schedule, but only host 0 writes artifacts — concurrent writes to a
    # shared model_path would corrupt checkpoints/logs
    primary = is_primary()
    scene = load_scene(lp.source_path, lp.images, lp.masks or None,
                       lp.eval, lp.resolution, lp.white_background)
    build_nearest_view_graph(scene.train_views, lp.multi_view_max_angle,
                             lp.multi_view_min_dis, lp.multi_view_max_dis,
                             lp.multi_view_num)
    os.makedirs(lp.model_path, exist_ok=True)
    if primary:
        from gsjax.data.readers import write_scene_artifacts
        write_scene_artifacts(lp.model_path, scene)
        with open(os.path.join(lp.model_path, "multi_view.json"), "w") as f:
            for v in scene.train_views:
                f.write(json.dumps(
                    {"ref_name": v.image_name,
                     "nearest_name": [scene.train_views[i].image_name
                                      for i in v.nearest_ids]}) + "\n")

    trainer = Trainer.create(
        scene, op, lp.model_path, sh_degree=lp.sh_degree, sg_degree=lp.sg_degree,
        kernel_size=lp.kernel_size, white_background=lp.white_background,
        disable_filter3d=lp.disable_filter3D,
        appearance=APPEARANCE_KINDS[lp.use_decoupled_appearance])

    trainer.random_background = bool(getattr(op, "random_background", False))
    trainer.debug = bool(getattr(pp, "debug", False))
    cap0 = int(getattr(args, "pair_capacity_init", 0) or 0)
    if cap0 > 0:
        # pre-size so capacity-bump recompiles (minutes each for the
        # reg-phase program) never hit mid-training; memory is cheap
        # relative (16 floats per slot)
        trainer.pair_capacity = max(trainer.pair_capacity, next_pow2(cap0))
    n_req = int(getattr(args, "n_devices", 1) or 1)
    if n_req != 1:
        from gsjax.parallel import make_mesh
        n = len(jax.devices()) if n_req <= 0 else n_req
        if n > 1:
            trainer.mesh = make_mesh(n)
            trainer.dev_pair_capacity = next_pow2(
                int(trainer.pair_capacity / n * 1.5))
            print(f"Sharding tiles over {n} devices "
                  f"({jax.process_count()} process(es))")

    if getattr(args, "start_checkpoint", None):
        p, a, ad, it, extra = load_checkpoint(args.start_checkpoint)
        trainer.params, trainer.aux, trainer.adam, trainer.iteration = p, a, ad, it
        trainer.app = app_lib.state_from_arrays(trainer.app, extra)

    test_iters = set(getattr(args, "test_iterations", [7000, 30000]))
    save_iters = set(getattr(args, "save_iterations", [7000, 30000]))
    ckpt_iters = set(getattr(args, "checkpoint_iterations", [15000]))
    test_iters.add(op.iterations)
    save_iters.add(op.iterations)

    # TensorBoard scalars, mirroring training_report (train.py:296-379);
    # soft dependency so headless/minimal installs still train.
    tb = None
    if primary:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb = SummaryWriter(lp.model_path)
        except Exception:
            pass
    profile_iter = int(getattr(args, "profile_iter", 0) or 0)

    # live-viewer server (SIBR remote protocol), reference train.py:93-120
    gui = None
    if getattr(args, "ip", None):
        from gsjax.viewer.network_gui import NetworkGUI
        try:
            gui = NetworkGUI(args.ip, int(getattr(args, "port", 6009)))
        except OSError as e:
            print(f"viewer server unavailable ({e}); training without GUI")

    ema = 0.0
    t0 = time.time()
    profiling = False
    try:
      while trainer.iteration < op.iterations:
        # jax.profiler trace of 5 regular loop iterations (SURVEY section 5:
        # tracing — replaces the reference's cuda-event iter timing). The
        # profiled steps ARE the loop's steps, so test/save/ckpt bookkeeping
        # below still sees every iteration.
        if gui is not None:
            serve_viewer(gui, trainer, lp.source_path, op.iterations)
        if profile_iter and trainer.iteration + 1 == profile_iter:
            jax.profiler.start_trace(os.path.join(lp.model_path, "profile"))
            profiling = True
        metrics = trainer.step()
        if profiling and trainer.iteration >= profile_iter + 4:
            jax.profiler.stop_trace()
            profiling = False
        it = trainer.iteration
        ema = 0.4 * float(metrics["loss"]) + 0.6 * ema
        if it % 100 == 0:
            dt = time.time() - t0
            print(f"[{it}] loss={ema:.4f} n={int(jnp.sum(trainer.aux.alive))} "
                  f"pairs={int(metrics['num_pairs'])} {100/dt:.2f} it/s",
                  flush=True)
            if tb is not None:
                tb.add_scalar("train_loss_patches/total_loss", ema, it)
                for k, tag in (("l1", "train_loss_patches/l1_loss"),
                               ("dn_loss", "train_loss_patches/normal_loss"),
                               ("ncc_loss", "train_loss_patches/ncc_loss"),
                               ("geo_loss", "train_loss_patches/geo_loss")):
                    if k in metrics:
                        tb.add_scalar(tag, float(metrics[k]), it)
                tb.add_scalar("total_points",
                              int(jnp.sum(trainer.aux.alive)), it)
                tb.add_scalar("iter_time", dt / 100.0 * 1000.0, it)
            t0 = time.time()
        if it in test_iters and scene.test_views and primary:
            psnr = trainer.evaluate(scene.test_views)
            print(f"[{it}] test PSNR {psnr:.3f}", flush=True)
            with open(os.path.join(lp.model_path, f"chkpnt{it}.txt"), "w") as f:
                f.write(f"[ITER {it}] Evaluating test: PSNR {psnr}\n")
            if tb is not None:
                tb.add_scalar("test/psnr", psnr, it)
                op_np = np.asarray(gm.get_opacity(trainer.params))[
                    np.asarray(trainer.aux.alive)]
                if op_np.size:
                    tb.add_histogram("scene/opacity_histogram", op_np, it)
                # rendered/gt/depth images for the first few held-out views
                # (training_report, train.py:322-360)
                from gsjax.utils.trajectories import apply_depth_colormap
                for v in scene.test_views[:5]:
                    out = trainer.render_view(v, require_depth=True)
                    img = np.clip(np.asarray(out["render"]), 0, 1)
                    tb.add_image(f"{v.image_name}/render", img, it,
                                 dataformats="HWC")
                    tb.add_image(f"{v.image_name}/depth",
                                 apply_depth_colormap(
                                     np.asarray(out["median_depth"])),
                                 it, dataformats="HWC")
                    if it == min(test_iters):
                        tb.add_image(f"{v.image_name}/ground_truth",
                                     np.asarray(trainer.gt_for(v)), it,
                                     dataformats="HWC")
        if it in save_iters and primary:
            trainer.save_model()
        if it in ckpt_iters and primary:
            trainer.save_ckpt()
    finally:
        # a step raising mid-profile (e.g. the non-finite-loss snapshot
        # path) must not leave the trace open/unflushed
        if profiling:
            jax.profiler.stop_trace()
        if tb is not None:
            tb.close()
    return trainer
