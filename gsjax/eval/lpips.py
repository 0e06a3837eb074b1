"""LPIPS perceptual metric (VGG16 backbone) in JAX.

Equivalent of the vendored `lpipsPyTorch/` package. The architecture is
self-contained; pretrained VGG16 + linear-head weights cannot be downloaded in
this offline environment, so they are loaded from an `.npz` pointed to by
`GSJAX_LPIPS_WEIGHTS` (convert once with `convert_torch_weights`). Without
weights, `lpips()` returns None and `metric.py` reports `lpips: null`.

Expected npz keys: conv{i}_w [OIHW], conv{i}_b for the 13 VGG16 convs, and
lin{k}_w [1,C,1,1] for the 5 LPIPS linear heads; shift/scale normalisation
constants are built in.
"""

from __future__ import annotations

import os

import numpy as np

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_SLICE_AFTER = {1: 0, 3: 1, 6: 2, 9: 3, 12: 4}  # conv index -> head index
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_weights():
    path = os.environ.get("GSJAX_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    return dict(np.load(path))


def available() -> bool:
    return load_weights() is not None


def _vgg_features(weights, x):
    """x: [H,W,3] in [-1,1]-ish (after shift/scale). Returns 5 feature maps."""
    import jax
    import jax.numpy as jnp

    feats = []
    conv_i = 0
    h = jnp.transpose(x, (2, 0, 1))[None]           # [1,3,H,W]
    for c in _VGG_CFG:
        if c == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            continue
        w = jnp.asarray(weights[f"conv{conv_i}_w"])
        b = jnp.asarray(weights[f"conv{conv_i}_b"])
        h = jax.lax.conv_general_dilated(h, w, (1, 1), "SAME",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jax.nn.relu(h + b[None, :, None, None])
        if conv_i in _SLICE_AFTER:
            feats.append(h)
        conv_i += 1
    return feats


def lpips(img1, img2, weights=None):
    """img1/img2: [H,W,3] in [0,1]. Returns float or None if no weights."""
    import jax.numpy as jnp

    weights = weights or load_weights()
    if weights is None:
        return None
    x1 = (2 * jnp.asarray(img1) - 1 - _SHIFT) / _SCALE
    x2 = (2 * jnp.asarray(img2) - 1 - _SHIFT) / _SCALE
    f1 = _vgg_features(weights, x1)
    f2 = _vgg_features(weights, x2)
    total = 0.0
    for k, (a, b) in enumerate(zip(f1, f2)):
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        diff = (an - bn) ** 2
        lin = jnp.asarray(weights[f"lin{k}_w"])      # [1,C,1,1]
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return float(total)


def convert_torch_weights(out_path):
    """One-time converter: torchvision VGG16 + lpips package -> npz."""
    import torch

    import lpips as lpips_pkg  # noqa: F401  (requires network once, offline cache ok)

    net = lpips_pkg.LPIPS(net="vgg")
    arrs = {}
    conv_i = 0
    for layer in net.net.slice1 + net.net.slice2 + net.net.slice3 + \
            net.net.slice4 + net.net.slice5:
        if isinstance(layer, torch.nn.Conv2d):
            arrs[f"conv{conv_i}_w"] = layer.weight.detach().numpy()
            arrs[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            conv_i += 1
    for k, lin in enumerate(net.lins):
        arrs[f"lin{k}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **arrs)
