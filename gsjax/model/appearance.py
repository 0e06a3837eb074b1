"""Decoupled appearance models.

Equivalents of `scene/gaussian_model.py:271-302` + `scene/appearance_network.py`:
  - "gs":   per-view 3x4 exposure matrix (init identity)
  - "pgsr": per-view (log-gain, bias) pair (init zeros)
  - "gof":  per-view 64-d embedding + CNN producing a per-pixel RGB multiplier
The embedding table is optimised with whole-table Adam exactly like the torch
reference (unselected rows receive zero gradients but their moments decay).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TableAdam:
    mu: Any
    nu: Any
    count: jax.Array


@dataclasses.dataclass
class AppearanceState:
    kind: str                      # no | gs | pgsr | gof
    table: Optional[jax.Array]     # [C, ...] per-view embeddings
    net: Optional[dict]            # GOF CNN params
    opt: Optional[TableAdam]
    net_opt: Optional[TableAdam]


def init_appearance(kind: str, num_cams: int, seed: int = 0) -> AppearanceState:
    if kind == "no":
        return AppearanceState("no", None, None, None, None)
    if kind == "gs":
        table = jnp.tile(jnp.eye(3, 4)[None], (num_cams, 1, 1))
    elif kind == "pgsr":
        table = jnp.zeros((num_cams, 2))
    elif kind == "gof":
        table = 1e-4 * jax.random.normal(jax.random.PRNGKey(seed), (num_cams, 64))
    else:
        raise ValueError(kind)
    opt = TableAdam(jnp.zeros_like(table), jnp.zeros_like(table),
                    jnp.zeros((), jnp.int32))
    net = net_opt = None
    if kind == "gof":
        net = init_gof_net(jax.random.PRNGKey(seed + 1))
        zeros = jax.tree_util.tree_map(jnp.zeros_like, net)
        net_opt = TableAdam(zeros, jax.tree_util.tree_map(jnp.zeros_like, net),
                            jnp.zeros((), jnp.int32))
    return AppearanceState(kind, table, net, opt, net_opt)


def adam_tree(params, grads, state: TableAdam, lr, b1=0.9, b2=0.999, eps=1e-15):
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1, bc2 = 1 - b1 ** c, 1 - b2 ** c

    def upd(p, g, mu, nu):
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g * g
        return p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps), mu, nu

    flat_p, tdef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_mu = jax.tree_util.tree_leaves(state.mu)
    flat_nu = jax.tree_util.tree_leaves(state.nu)
    out = [upd(p, g, mu, nu) for p, g, mu, nu in zip(flat_p, flat_g, flat_mu, flat_nu)]
    new_p = tdef.unflatten([o[0] for o in out])
    new_mu = tdef.unflatten([o[1] for o in out])
    new_nu = tdef.unflatten([o[2] for o in out])
    return new_p, TableAdam(new_mu, new_nu, count)


def update_table(state: AppearanceState, uid: int, grad_row: jax.Array,
                 lr: float) -> AppearanceState:
    """Whole-table Adam step with the gradient scattered into row `uid`."""
    grads = jnp.zeros_like(state.table).at[uid].set(grad_row)
    table, opt = adam_tree(state.table, grads, state.opt, lr)
    return dataclasses.replace(state, table=table, opt=opt)


# --- checkpoint (de)serialisation --------------------------------------------
#
# The reference's capture()/restore() includes the appearance nets and their
# optimizer state (scene/gaussian_model.py:88-144); these helpers flatten the
# whole AppearanceState into flat path-keyed arrays for the npz checkpoint.

def state_to_arrays(app: AppearanceState) -> dict:
    """Flatten table + net + both Adam states into {path: ndarray}."""
    out = {}
    if app.table is not None:
        out["app/table"] = np.asarray(app.table)
        out["app/opt/mu"] = np.asarray(app.opt.mu)
        out["app/opt/nu"] = np.asarray(app.opt.nu)
        out["app/opt/count"] = np.asarray(app.opt.count)
    if app.net is not None:
        for layer, p in app.net.items():
            for k, v in p.items():
                out[f"app/net/{layer}/{k}"] = np.asarray(v)
                out[f"app/net_opt/mu/{layer}/{k}"] = np.asarray(
                    app.net_opt.mu[layer][k])
                out[f"app/net_opt/nu/{layer}/{k}"] = np.asarray(
                    app.net_opt.nu[layer][k])
        out["app/net_opt/count"] = np.asarray(app.net_opt.count)
    return out


def state_from_arrays(app: AppearanceState, arrs: dict) -> AppearanceState:
    """Rebuild an AppearanceState of `app.kind` from flattened arrays
    (inverse of state_to_arrays). Unknown/absent keys leave `app` parts
    untouched; the legacy 'app_table' key restores the table only."""
    if app.kind == "no":
        return app
    if "app_table" in arrs and "app/table" not in arrs:   # legacy checkpoints
        return dataclasses.replace(app, table=jnp.asarray(arrs["app_table"]))
    if "app/table" not in arrs:
        return app
    opt = TableAdam(jnp.asarray(arrs["app/opt/mu"]),
                    jnp.asarray(arrs["app/opt/nu"]),
                    jnp.asarray(arrs["app/opt/count"]))
    net, net_opt = app.net, app.net_opt
    if app.net is not None and "app/net_opt/count" in arrs:
        net = {layer: {k: jnp.asarray(arrs[f"app/net/{layer}/{k}"])
                       for k in p} for layer, p in app.net.items()}
        mu = {layer: {k: jnp.asarray(arrs[f"app/net_opt/mu/{layer}/{k}"])
                      for k in p} for layer, p in app.net.items()}
        nu = {layer: {k: jnp.asarray(arrs[f"app/net_opt/nu/{layer}/{k}"])
                      for k in p} for layer, p in app.net.items()}
        net_opt = TableAdam(mu, nu, jnp.asarray(arrs["app/net_opt/count"]))
    return dataclasses.replace(app, table=jnp.asarray(arrs["app/table"]),
                               opt=opt, net=net, net_opt=net_opt)


# --- GOF appearance CNN (scene/appearance_network.py) ------------------------

def _conv_init(key, cin, cout, k=3):
    """Kaiming-uniform with a=sqrt(5) (torch Conv2d default): bound = 1/sqrt(fan_in)."""
    wk, bk = jax.random.split(key)
    fan_in = cin * k * k
    bound = float(np.sqrt(1.0 / fan_in))
    w = jax.random.uniform(wk, (cout, cin, k, k), minval=-bound, maxval=bound)
    b = jax.random.uniform(bk, (cout,), minval=-bound, maxval=bound)
    return dict(w=w, b=b)


def init_gof_net(key, cin=3 + 64, cout=3):
    keys = jax.random.split(key, 7)
    return dict(
        conv1=_conv_init(keys[0], cin, 256),
        up1=_conv_init(keys[1], 256 // 4, 128),
        up2=_conv_init(keys[2], 128 // 4, 64),
        up3=_conv_init(keys[3], 64 // 4, 32),
        up4=_conv_init(keys[4], 32 // 4, 16),
        conv2=_conv_init(keys[5], 16, 16),
        conv3=_conv_init(keys[6], 16, cout),
    )


def _conv(x, p):
    """x: [1,C,H,W], SAME 3x3."""
    y = jax.lax.conv_general_dilated(x, p["w"], (1, 1), "SAME",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def _pixel_shuffle(x, r=2):
    n, c, h, w = x.shape
    x = x.reshape(n, c // (r * r), r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, c // (r * r), h * r, w * r)


def _bilinear_x2_align(x):
    """x2 upsample, align_corners=True (torch F.interpolate semantics)."""
    n, c, h, w = x.shape
    yi = jnp.linspace(0.0, h - 1.0, 2 * h)
    xi = jnp.linspace(0.0, w - 1.0, 2 * w)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yi - y0)[None, None, :, None]
    wx = (xi - x0)[None, None, None, :]
    g = lambda ys, xs: x[:, :, ys][:, :, :, xs]
    return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y1, x0) * wy * (1 - wx)
            + g(y0, x1) * (1 - wy) * wx + g(y1, x1) * wy * wx)


def gof_forward(net, x):
    """x: [1, 3+64, H/32, W/32] -> [1, 3, H, W] multiplier in (0,1)."""
    x = jax.nn.relu(_conv(x, net["conv1"]))
    for k in ("up1", "up2", "up3", "up4"):
        x = jax.nn.relu(_conv(_pixel_shuffle(x), net[k]))
    x = _bilinear_x2_align(x)
    x = jax.nn.relu(_conv(x, net["conv2"]))
    x = _conv(x, net["conv3"])
    return jax.nn.sigmoid(x)


def downsample_align(img, h_out, w_out):
    """Bilinear align_corners=True resize of [H,W,C] -> [h_out,w_out,C]
    (torch F.interpolate(..., align_corners=True) in loss_utils.py:113)."""
    h, w, _ = img.shape
    yi = jnp.linspace(0.0, h - 1.0, h_out)
    xi = jnp.linspace(0.0, w - 1.0, w_out)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yi - y0)[:, None, None]
    wx = (xi - x0)[None, :, None]
    g = lambda ys, xs: img[ys][:, xs]
    return (g(y0, x0) * (1 - wy) * (1 - wx) + g(y1, x0) * wy * (1 - wx)
            + g(y0, x1) * (1 - wy) * wx + g(y1, x1) * wy * wx)


def gof_mapped(image, gt, net, embedding):
    """GOF appearance mapping (loss_utils.py:105-119). image/gt: [H,W,3].
    Returns (mapped, crop_gt), both [h,w,3] centre crops to the /32 grid —
    split out so the sharded step can band-sum the final L1 while the (cheap,
    1/32-res input) CNN runs replicated."""
    h0, w0 = image.shape[:2]
    h, w = h0 // 32 * 32, w0 // 32 * 32
    top, left = (h0 - h) // 2, (w0 - w) // 2
    crop = jax.lax.dynamic_slice(image, (top, left, 0), (h, w, 3))
    crop_gt = jax.lax.dynamic_slice(gt, (top, left, 0), (h, w, 3))
    down = downsample_align(crop, h // 32, w // 32)        # [h/32,w/32,3]
    emb = jnp.broadcast_to(embedding[None, None, :], (h // 32, w // 32, 64))
    net_in = jnp.concatenate([down, emb], axis=-1)
    net_in = jnp.transpose(net_in, (2, 0, 1))[None]        # [1,67,h/32,w/32]
    mapping = gof_forward(net, net_in)[0]                  # [3,h,w]
    mapped = jnp.transpose(mapping, (1, 2, 0)) * crop
    return mapped, crop_gt


def l1_appearance_gof(image, gt, net, embedding):
    """GOF appearance L1 (loss_utils.py:105-119). image/gt: [H,W,3]."""
    mapped, crop_gt = gof_mapped(image, gt, net, embedding)
    return jnp.mean(jnp.abs(mapped - crop_gt))
