"""Model serialisation: reference-compatible PLY snapshots + npz checkpoints.

PLY attribute layout matches `scene/gaussian_model.py:450-493` (x,y,z, nx..,
f_dc_*, f_rest_*, opacity, scale_*, rot_*, sg_axis_*, sg_sharpness_*,
sg_color_*, filter_3D) so models can be exchanged with the reference tooling.
f_dc/f_rest are flattened channel-major (torch `transpose(1,2).flatten`):
f_rest_i = features_rest[:, i % M, i // M] for M = bands-1.
"""

from __future__ import annotations

import os

import numpy as np

from gsjax.data.ply import read_ply, write_ply
from gsjax.model.gaussians import AdamState, GaussianAux, GaussianParams


def save_ply(path, params: GaussianParams, aux: GaussianAux):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    alive = np.asarray(aux.alive)
    sel = lambda x: np.asarray(x)[alive].astype(np.float32)

    xyz = sel(params.xyz)
    n = xyz.shape[0]
    cols = dict(x=xyz[:, 0], y=xyz[:, 1], z=xyz[:, 2],
                nx=np.zeros(n, np.float32), ny=np.zeros(n, np.float32),
                nz=np.zeros(n, np.float32))
    f_dc = sel(params.features_dc)       # [n,1,3]
    for i in range(3):
        cols[f"f_dc_{i}"] = f_dc[:, 0, i]
    f_rest = sel(params.features_rest)   # [n,M,3]
    m = f_rest.shape[1]
    for i in range(3 * m):
        cols[f"f_rest_{i}"] = f_rest[:, i % m, i // m]
    cols["opacity"] = sel(params.opacity)[:, 0]
    scal = sel(params.scaling)
    for i in range(3):
        cols[f"scale_{i}"] = scal[:, i]
    rot = sel(params.rotation)
    for i in range(4):
        cols[f"rot_{i}"] = rot[:, i]
    sg_axis = sel(params.sg_axis)        # [n,G,3]
    g = sg_axis.shape[1]
    for i in range(3 * g):
        cols[f"sg_axis_{i}"] = sg_axis[:, i // 3, i % 3]
    sg_sharp = sel(params.sg_sharpness)
    for i in range(g):
        cols[f"sg_sharpness_{i}"] = sg_sharp[:, i]
    sg_color = sel(params.sg_color)
    for i in range(3 * g):
        cols[f"sg_color_{i}"] = sg_color[:, i // 3, i % 3]
    cols["filter_3D"] = sel(aux.filter_3d)
    write_ply(path, cols)


def load_ply(path, capacity: int | None = None):
    """-> (GaussianParams, GaussianAux). Capacity defaults to next pow2."""
    import jax.numpy as jnp

    v = read_ply(path)
    n = len(v["x"])
    cap = capacity or max(1 << (n - 1).bit_length(), n)

    def pad(x, fill=0.0):
        x = np.asarray(x, np.float32)
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    xyz = np.stack([v["x"], v["y"], v["z"]], 1)
    n_rest = len([k for k in v if k.startswith("f_rest_")])
    m = n_rest // 3
    f_rest = np.zeros((n, m, 3), np.float32)
    for i in range(n_rest):
        f_rest[:, i % m, i // m] = v[f"f_rest_{i}"]
    f_dc = np.stack([v["f_dc_0"], v["f_dc_1"], v["f_dc_2"]], 1)[:, None, :]
    g = len([k for k in v if k.startswith("sg_sharpness_")])
    g_eff = max(g, 1)
    sg_axis = np.zeros((n, g_eff, 3), np.float32)
    sg_sharp = np.zeros((n, g_eff), np.float32)
    sg_color = np.zeros((n, g_eff, 3), np.float32)
    for i in range(3 * g):
        sg_axis[:, i // 3, i % 3] = v[f"sg_axis_{i}"]
        sg_color[:, i // 3, i % 3] = v[f"sg_color_{i}"]
    for i in range(g):
        sg_sharp[:, i] = v[f"sg_sharpness_{i}"]
    scaling = np.stack([v[f"scale_{i}"] for i in range(3)], 1)
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], 1)

    params = GaussianParams(
        xyz=pad(xyz), features_dc=pad(f_dc), features_rest=pad(f_rest),
        opacity=pad(np.asarray(v["opacity"])[:, None]),
        scaling=pad(scaling), rotation=pad(rotation),
        sg_axis=pad(sg_axis), sg_sharpness=pad(sg_sharp), sg_color=pad(sg_color))
    params.rotation = params.rotation.at[n:, 0].set(1.0)
    filt = np.asarray(v.get("filter_3D", np.zeros(n)), np.float32).reshape(-1)
    aux = GaussianAux(
        alive=jnp.arange(cap) < n,
        filter_3d=pad(filt),
        grad_accum=jnp.zeros(cap), grad_accum_abs=jnp.zeros(cap),
        denom=jnp.zeros(cap), max_radii=jnp.zeros(cap, jnp.int32))
    return params, aux


def save_checkpoint(path, params: GaussianParams, aux: GaussianAux,
                    adam: AdamState, iteration: int, extra: dict | None = None):
    """Full training checkpoint (replaces torch.save(capture()),
    scene/gaussian_model.py:88-113)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import dataclasses as dc
    arrs = {"iteration": np.asarray(iteration)}
    for f in dc.fields(GaussianParams):
        arrs[f"p_{f.name}"] = np.asarray(getattr(params, f.name))
        arrs[f"mu_{f.name}"] = np.asarray(getattr(adam.mu, f.name))
        arrs[f"nu_{f.name}"] = np.asarray(getattr(adam.nu, f.name))
    for f in dc.fields(GaussianAux):
        arrs[f"a_{f.name}"] = np.asarray(getattr(aux, f.name))
    arrs["adam_count"] = np.asarray(adam.count)
    for k, v in (extra or {}).items():
        arrs[f"x_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrs)


def load_checkpoint(path):
    import dataclasses as dc

    import jax.numpy as jnp

    z = np.load(path)
    def gp(prefix):
        return GaussianParams(**{f.name: jnp.asarray(z[f"{prefix}_{f.name}"])
                                 for f in dc.fields(GaussianParams)})
    params = gp("p")
    adam = AdamState(mu=gp("mu"), nu=gp("nu"), count=jnp.asarray(z["adam_count"]))
    aux = GaussianAux(**{f.name: jnp.asarray(z[f"a_{f.name}"])
                         for f in dc.fields(GaussianAux)})
    extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return params, aux, adam, int(z["iteration"]), extra
