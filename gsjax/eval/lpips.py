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


# torchvision VGG16 `features` module indices of the 13 convs (convs at
# 0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28 with ReLU/MaxPool between)
_TV_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_state_dicts(vgg_features_sd, lin_weights, out_path=None):
    """Convert raw state dicts to the npz key layout `lpips()` expects.

    vgg_features_sd: torchvision-layout dict with `features.N.weight/bias`
    for the VGG16 convs; lin_weights: the 5 LPIPS linear-head weights, each
    [1, C, 1, 1] (lpips pkg `lins[k].model[-1].weight`). Offline-testable —
    no torchvision/lpips import needed (tests/test_lpips.py locks the
    mapping against a torch re-implementation with random weights)."""
    arrs = {}
    for i, n in enumerate(_TV_CONV_IDX):
        arrs[f"conv{i}_w"] = np.asarray(vgg_features_sd[f"features.{n}.weight"])
        arrs[f"conv{i}_b"] = np.asarray(vgg_features_sd[f"features.{n}.bias"])
    for k, w in enumerate(lin_weights):
        w = np.asarray(w)
        assert w.ndim == 4 and w.shape[0] == 1 and w.shape[2:] == (1, 1), w.shape
        arrs[f"lin{k}_w"] = w
    if out_path:
        np.savez(out_path, **arrs)
    return arrs


def convert_torch_weights(out_path):
    """One-time converter on a machine with the lpips package installed:
    lpips.LPIPS(net='vgg') (pretrained VGG16 + heads) -> npz."""
    import torch

    import lpips as lpips_pkg  # requires network once; offline cache ok

    net = lpips_pkg.LPIPS(net="vgg")
    convs = [layer for slc in (net.net.slice1, net.net.slice2, net.net.slice3,
                               net.net.slice4, net.net.slice5)
             for layer in slc if isinstance(layer, torch.nn.Conv2d)]
    sd = {}
    for i, layer in enumerate(convs):
        sd[f"features.{_TV_CONV_IDX[i]}.weight"] = layer.weight.detach().numpy()
        sd[f"features.{_TV_CONV_IDX[i]}.bias"] = layer.bias.detach().numpy()
    lins = [lin.model[-1].weight.detach().numpy() for lin in net.lins]
    convert_state_dicts(sd, lins, out_path)


if __name__ == "__main__":
    # One-command offline conversion (run on any machine with the `lpips`
    # pip package + its cached VGG16 weights, then copy the npz here):
    #
    #   python -m gsjax.eval.lpips /path/to/lpips_vgg.npz
    #   GSJAX_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz python metric.py -m <dir>
    #
    # Equivalent of lpipsPyTorch/__init__.py:6-21 + modules/lpips.py in the
    # reference (which downloads torchvision VGG16 at import time).
    import sys

    if len(sys.argv) != 2:
        sys.exit("usage: python -m gsjax.eval.lpips <out.npz>   "
                 "(requires the `lpips` pip package on THIS machine)")
    convert_torch_weights(sys.argv[1])
    print(f"wrote {sys.argv[1]}; use via GSJAX_LPIPS_WEIGHTS={sys.argv[1]}")
