"""Gaussian point-cloud model as a fixed-capacity pytree.

Functional re-design of `scene/gaussian_model.py` for XLA: parameters live in
padded [CAP, ...] arrays with an `alive` mask so shapes stay static across
densification (the reference reallocates tensors and performs optimizer-state
surgery in-place, :613-816); here clone/split/prune is a pure function that
scatters new gaussians into dead slots and zeroes their Adam moments, exactly
reproducing the reference's moment semantics (cat zeros for new points,
gather for survivors).

Adam is implemented inline (not optax) so the moment surgery stays a plain
pytree edit; eps=1e-15 and per-group LRs match `training_setup`
(scene/gaussian_model.py:342-439).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.core import sh as sh_lib
from gsjax.core.quaternion import to_rotation_matrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Trainable leaves, [CAP, ...]. Raw (pre-activation) parameterisation:
    log-scales, logit-opacity, unnormalised quaternions / SG axes — matching
    `scene/gaussian_model.py:45-62`."""
    xyz: jax.Array            # [N,3]
    features_dc: jax.Array    # [N,1,3]
    features_rest: jax.Array  # [N,M-1,3]
    opacity: jax.Array        # [N,1] logit
    scaling: jax.Array        # [N,3] log
    rotation: jax.Array       # [N,4]
    sg_axis: jax.Array        # [N,G,3]
    sg_sharpness: jax.Array   # [N,G] pre-softplus
    sg_color: jax.Array       # [N,G,3]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianAux:
    """Non-trainable per-gaussian state."""
    alive: jax.Array          # [N] bool
    filter_3d: jax.Array      # [N] Mip-Splatting 3D filter sigma
    grad_accum: jax.Array     # [N] |dL/dmean2d_ndc| accumulated
    grad_accum_abs: jax.Array  # [N] abs-grad channel (GOF)
    denom: jax.Array          # [N]
    max_radii: jax.Array      # [N] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    count: jax.Array


# per-group LRs, `OptimizationParams` defaults (arguments/__init__.py:84-97).
LR_FIELDS = dict(
    xyz=None,  # scheduled externally (position_lr * spatial_lr_scale)
    features_dc=0.0013,
    features_rest=0.00011,
    opacity=0.05,
    scaling=0.005,
    rotation=0.001,
    sg_axis=0.002,
    sg_sharpness=0.095,
    sg_color=0.00064,
)


# --- activations -------------------------------------------------------------

def get_scaling(p: GaussianParams) -> jax.Array:
    return jnp.exp(p.scaling)


def get_opacity(p: GaussianParams) -> jax.Array:
    return jax.nn.sigmoid(p.opacity)


def get_features(p: GaussianParams) -> jax.Array:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def get_sg_sharpness(p: GaussianParams) -> jax.Array:
    return jax.nn.softplus(p.sg_sharpness)


def get_sg_axis(p: GaussianParams) -> jax.Array:
    n = jnp.linalg.norm(p.sg_axis, axis=2, keepdims=True)
    return p.sg_axis / jnp.maximum(n, 1e-12)


def scaling_n_opacity_with_3d_filter(p: GaussianParams, filter_3d: jax.Array):
    """Mip-Splatting 3D filter applied to scales and opacity
    (scene/gaussian_model.py:203-212)."""
    opacity = get_opacity(p)
    scales = get_scaling(p)
    scales_sq = jnp.square(scales)
    det1 = jnp.prod(scales_sq, axis=1)
    scales_after = scales_sq + jnp.square(filter_3d)[:, None]
    det2 = jnp.prod(scales_after, axis=1)
    coef = jnp.sqrt(det1 / jnp.maximum(det2, 1e-30))
    return jnp.sqrt(scales_after), opacity * coef[:, None]


def opacity_with_3d_filter(p: GaussianParams, filter_3d: jax.Array) -> jax.Array:
    return scaling_n_opacity_with_3d_filter(p, filter_3d)[1]


def scaling_with_3d_filter(p: GaussianParams, filter_3d: jax.Array) -> jax.Array:
    return scaling_n_opacity_with_3d_filter(p, filter_3d)[0]


# --- 3D filter ---------------------------------------------------------------

def compute_3d_filter(xyz: jax.Array, alive: jax.Array,
                      view_mats: jax.Array, focals_x: jax.Array,
                      widths: jax.Array, heights: jax.Array,
                      focals_y: jax.Array) -> jax.Array:
    """Min view depth / max focal * sqrt(0.2) (scene/gaussian_model.py:226-262).

    view_mats: [C,4,4] world->camera; focals/widths/heights: [C].
    """
    def one_cam(carry, c):
        dist, valid_any = carry
        wv, fx, fy, w, h = (view_mats[c], focals_x[c], focals_y[c],
                            widths[c], heights[c])
        cam = jnp.einsum("ni,ji->nj", xyz, wv[:3, :3],
                         precision=jax.lax.Precision.HIGHEST) + wv[:3, 3]
        z = cam[:, 2]
        valid_depth = z > 0.2
        z_safe = jnp.where(valid_depth, z, 1.0)
        u = jnp.abs(cam[:, 0] / z_safe)
        v = jnp.abs(cam[:, 1] / z_safe)
        in_screen = (u <= w / fx * 0.575) & (v <= h / fy * 0.575)
        valid = valid_depth & in_screen
        dist = jnp.where(valid, jnp.minimum(dist, z), dist)
        return (dist, valid_any | valid), None

    n = xyz.shape[0]
    init = (jnp.full((n,), jnp.inf), jnp.zeros((n,), bool))
    (dist, valid_any), _ = jax.lax.scan(one_cam, init, jnp.arange(view_mats.shape[0]))
    max_focal = jnp.maximum(jnp.max(focals_x), 1e-6)
    fallback = jnp.max(jnp.where(valid_any & alive, dist, -jnp.inf))
    fallback = jnp.where(jnp.isfinite(fallback), fallback, 1.0)
    dist = jnp.where(valid_any, dist, fallback)
    return dist / max_focal * (0.2 ** 0.5)


# --- init --------------------------------------------------------------------

def inverse_sigmoid(x):
    return np.log(x / (1 - x))


def init_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                  sh_degree: int, sg_degree: int, knn_dist2: np.ndarray,
                  seed: int = 0) -> tuple[GaussianParams, GaussianAux]:
    """`create_from_pcd` (scene/gaussian_model.py:304-340), padded to capacity."""
    n = points.shape[0]
    assert capacity >= n
    m = (sh_degree + 1) ** 2
    g = max(sg_degree, 1)  # keep at least 1 lobe slot so pytree shapes are stable
    rng = np.random.default_rng(seed)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out)

    fused_color = sh_lib.rgb_to_sh(colors.astype(np.float32))
    f_dc = fused_color[:, None, :]
    f_rest = np.zeros((n, m - 1, 3), np.float32)

    dist2 = np.maximum(knn_dist2, 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1
    opac = inverse_sigmoid(0.1 * np.ones((n, 1), np.float32))
    sg_axis = rng.normal(0, 1, (n, g, 3)).astype(np.float32)
    sg_axis /= np.maximum(np.linalg.norm(sg_axis, axis=2, keepdims=True), 1e-12)

    params = GaussianParams(
        xyz=pad(points.astype(np.float32)),
        features_dc=pad(f_dc),
        features_rest=pad(f_rest),
        opacity=pad(opac),
        scaling=pad(scales.astype(np.float32)),
        rotation=pad(rots, fill=0.0),
        sg_axis=pad(sg_axis),
        sg_sharpness=pad(np.zeros((n, g), np.float32)),
        sg_color=pad(np.zeros((n, g, 3), np.float32)),
    )
    # dead slots get identity quaternions to keep matrices sane
    params.rotation = params.rotation.at[n:, 0].set(1.0)
    alive = jnp.arange(capacity) < n
    aux = GaussianAux(
        alive=alive,
        filter_3d=jnp.zeros((capacity,)),
        grad_accum=jnp.zeros((capacity,)),
        grad_accum_abs=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii=jnp.zeros((capacity,), jnp.int32),
    )
    return params, aux


# --- Adam --------------------------------------------------------------------

def adam_init(params: GaussianParams) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(params: GaussianParams, grads: GaussianParams, state: AdamState,
                lrs: dict[str, Any], b1=0.9, b2=0.999, eps=1e-15):
    """One Adam step with per-field LRs (reference Adam eps=1e-15,
    scene/gaussian_model.py:347-351)."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1 - b1 ** c
    bc2 = 1 - b2 ** c

    new_p, new_mu, new_nu = {}, {}, {}
    for f in dataclasses.fields(GaussianParams):
        k = f.name
        g = getattr(grads, k)
        mu = b1 * getattr(state.mu, k) + (1 - b1) * g
        nu = b2 * getattr(state.nu, k) + (1 - b2) * g * g
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_p[k] = getattr(params, k) - lrs[k] * update
        new_mu[k] = mu
        new_nu[k] = nu
    return (GaussianParams(**new_p),
            AdamState(mu=GaussianParams(**new_mu), nu=GaussianParams(**new_nu),
                      count=count))


# --- opacity reset -----------------------------------------------------------

def reset_opacity(params: GaussianParams, aux: GaussianAux, adam: AdamState):
    """Clamp filtered opacity to <=0.01 and invert through the 3D filter
    (scene/gaussian_model.py:521-539); zeroes the opacity Adam moments
    (replace_tensor_to_optimizer, :613-628)."""
    cur = opacity_with_3d_filter(params, aux.filter_3d)
    new = jnp.minimum(cur, 0.01)
    scales_sq = jnp.square(get_scaling(params))
    det1 = jnp.prod(scales_sq, axis=1)
    det2 = jnp.prod(scales_sq + jnp.square(aux.filter_3d)[:, None], axis=1)
    coef = jnp.sqrt(det1 / jnp.maximum(det2, 1e-30))
    new = new / jnp.maximum(coef[:, None], 1e-12)
    new_raw = jnp.log(new / jnp.maximum(1 - new, 1e-12))
    params = dataclasses.replace(params, opacity=new_raw)
    adam = AdamState(
        mu=dataclasses.replace(adam.mu, opacity=jnp.zeros_like(adam.mu.opacity)),
        nu=dataclasses.replace(adam.nu, opacity=jnp.zeros_like(adam.nu.opacity)),
        count=adam.count)
    return params, adam


# --- densification -----------------------------------------------------------

def add_densification_stats(aux: GaussianAux, mean2d_grad: jax.Array,
                            visibility: jax.Array, width: int, height: int):
    """Accumulate NDC-scale viewspace gradients (train.py:237,
    gaussian_model.py:818-821; NDC scaling render_backward.cu:893)."""
    gx = mean2d_grad[:, 0] * (0.5 * width)
    gy = mean2d_grad[:, 1] * (0.5 * height)
    norm = jnp.sqrt(gx * gx + gy * gy)
    # abs-grad channel: the reference accumulates per-pixel |dx|+|dy| inside
    # the backward kernel (render_backward.cu:1028). The XLA-autodiff path only
    # has the summed gradient, so |sum| is used as the statistic; the GOF
    # quantile threshold self-calibrates to its scale.
    absn = jnp.abs(gx) + jnp.abs(gy)
    return dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum + jnp.where(visibility, norm, 0.0),
        grad_accum_abs=aux.grad_accum_abs + jnp.where(visibility, absn, 0.0),
        denom=aux.denom + visibility.astype(jnp.float32),
    )


def _scatter_params(params: GaussianParams, slots: jax.Array, parents: jax.Array,
                    write: jax.Array, new_vals: dict[str, jax.Array]):
    """Scatter candidate gaussians (rows `parents`, overrides in new_vals) into
    `slots` where `write`."""
    out = {}
    cap = params.capacity
    slots = jnp.where(write, slots, cap)  # out-of-range -> dropped
    for f in dataclasses.fields(GaussianParams):
        k = f.name
        src = new_vals.get(k)
        if src is None:
            src = getattr(params, k)[parents]
        out[k] = getattr(params, k).at[slots].set(src, mode="drop")
    return GaussianParams(**out)


def densify_and_prune(params: GaussianParams, aux: GaussianAux, adam: AdamState,
                      key: jax.Array, max_grad: float, min_opacity: float,
                      extent: jax.Array, percent_dense: float = 0.01):
    """GOF clone/split + opacity prune (scene/gaussian_model.py:737-816), as a
    pure function on the fixed-capacity arrays.

    Returns (params, aux, adam, stats) where stats = dict of scalar counts.
    """
    cap = params.capacity
    denom = jnp.maximum(aux.denom, 1.0)
    grads = jnp.where(aux.denom > 0, aux.grad_accum / denom, 0.0)
    grads_abs = jnp.where(aux.denom > 0, aux.grad_accum_abs / denom, 0.0)

    alive = aux.alive
    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=1)
    opac = get_opacity(params)[:, 0]

    grad_hit = (grads >= max_grad) & alive
    ratio = jnp.sum(grad_hit) / jnp.maximum(jnp.sum(alive), 1)
    # Q = quantile(grads_abs, 1 - ratio) over alive points (:803-804)
    sorted_abs = jnp.sort(jnp.where(alive, grads_abs, jnp.inf))
    n_alive = jnp.sum(alive)
    q_pos = jnp.clip((1.0 - ratio) * (n_alive.astype(jnp.float32) - 1), 0, cap - 1)
    lo = jnp.floor(q_pos).astype(jnp.int32)
    hi = jnp.ceil(q_pos).astype(jnp.int32)
    q_val = sorted_abs[lo] + (q_pos - lo) * (sorted_abs[hi] - sorted_abs[lo])
    q_val = jnp.where(jnp.isfinite(q_val), q_val, jnp.inf)

    small = max_scale <= percent_dense * extent
    clone_sel = grad_hit & small
    split_sel = ((grad_hit & ~small) | ((grads_abs >= q_val) & alive))

    # prune non-finite params too: a NaN-poisoned gaussian is render-inert
    # (preprocess culls it) but corrupts densify statistics and downstream
    # consumers (the tetra mesher's Delaunay rejects NaN points — observed
    # on the blobs golden scene, 135/86k alive slots NaN after 3.6k iters)
    finite = jnp.isfinite(params.xyz).all(axis=1) & \
        jnp.isfinite(get_scaling(params)).all(axis=1) & \
        jnp.isfinite(opac)
    opac_keep = (opac >= min_opacity) & finite
    survive = alive & ~split_sel & opac_keep

    # candidates: clone child, split child 1, split child 2
    k1, k2, k3 = jax.random.split(key, 3)
    rot = to_rotation_matrix(params.rotation /
                             jnp.maximum(jnp.linalg.norm(params.rotation, axis=-1,
                                                         keepdims=True), 1e-12))

    def sample_xyz(k):
        eps = jax.random.normal(k, (cap, 3)) * scaling
        return params.xyz + jnp.einsum("nij,nj->ni", rot, eps,
                                       precision=jax.lax.Precision.HIGHEST)

    split_scaling = jnp.log(jnp.maximum(scaling / (0.8 * 2), 1e-12))
    cand_masks = [clone_sel & opac_keep, split_sel & opac_keep, split_sel & opac_keep]
    cand_vals = [
        dict(xyz=sample_xyz(k1)),
        dict(xyz=sample_xyz(k2), scaling=split_scaling),
        dict(xyz=sample_xyz(k3), scaling=split_scaling),
    ]

    # free slot assignment
    dead = ~survive
    free_rank = jnp.cumsum(dead) - 1                      # rank of each dead slot
    num_free = jnp.sum(dead)
    slot_by_rank = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(dead, free_rank, cap)].set(jnp.arange(cap, dtype=jnp.int32),
                                             mode="drop")

    new_alive = survive
    offset = jnp.zeros((), jnp.int32)
    dropped = jnp.zeros((), jnp.int32)
    for mask, vals in zip(cand_masks, cand_vals):
        rank = offset + jnp.cumsum(mask) - 1
        write = mask & (rank < num_free)
        dropped = dropped + jnp.sum(mask & ~write)
        slots = slot_by_rank[jnp.clip(rank, 0, cap - 1)]
        parents = jnp.arange(cap)
        params = _scatter_params(params, slots, parents, write, vals)
        zeros = {f.name: jnp.zeros_like(getattr(adam.mu, f.name))[parents]
                 for f in dataclasses.fields(GaussianParams)}
        adam = AdamState(mu=_scatter_params(adam.mu, slots, parents, write, zeros),
                         nu=_scatter_params(adam.nu, slots, parents, write, zeros),
                         count=adam.count)
        new_alive = new_alive.at[jnp.where(write, slots, cap)].set(True, mode="drop")
        offset = offset + jnp.sum(mask)

    # survivors that were overwritten? impossible: slots come from dead set.
    # moments of killed slots cleared lazily on reuse; killed slots excluded by alive.
    zero = jnp.zeros((cap,))
    aux = GaussianAux(alive=new_alive, filter_3d=aux.filter_3d,
                      grad_accum=zero, grad_accum_abs=zero, denom=zero,
                      max_radii=jnp.zeros((cap,), jnp.int32))
    stats = dict(
        n_alive=jnp.sum(new_alive),
        n_cloned=jnp.sum(cand_masks[0]),
        n_split=jnp.sum(cand_masks[1]),
        n_pruned=jnp.sum(alive & ~opac_keep),
        n_dropped=dropped,
    )
    return params, aux, adam, stats


def grow_capacity(params: GaussianParams, aux: GaussianAux, adam: AdamState,
                  new_capacity: int):
    """Host-side capacity growth (recompile trigger)."""
    old = params.capacity
    assert new_capacity >= old

    def pad_p(p: GaussianParams) -> GaussianParams:
        out = {}
        for f in dataclasses.fields(GaussianParams):
            x = np.asarray(getattr(p, f.name))
            pad_shape = (new_capacity - old,) + x.shape[1:]
            out[f.name] = jnp.asarray(np.concatenate([x, np.zeros(pad_shape, x.dtype)]))
        res = GaussianParams(**out)
        res.rotation = res.rotation.at[old:, 0].set(1.0)
        return res

    def pad1(x, dtype=None):
        x = np.asarray(x)
        z = np.zeros((new_capacity - old,) + x.shape[1:], x.dtype)
        return jnp.asarray(np.concatenate([x, z]))

    aux = GaussianAux(alive=pad1(aux.alive), filter_3d=pad1(aux.filter_3d),
                      grad_accum=pad1(aux.grad_accum),
                      grad_accum_abs=pad1(aux.grad_accum_abs),
                      denom=pad1(aux.denom), max_radii=pad1(aux.max_radii))
    adam = AdamState(mu=pad_p(adam.mu), nu=pad_p(adam.nu), count=adam.count)
    return pad_p(params), aux, adam
