"""Shared test helpers: synthetic scenes."""

from __future__ import annotations

import numpy as np

from gsjax.ops.raster.camera import Camera


def random_gaussians(n: int, seed: int = 0, spread: float = 1.0, center_z: float = 4.0):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, spread, (n, 3)).astype(np.float32)
    means[:, 2] += center_z
    scales = np.exp(rng.normal(-2.2, 0.4, (n, 3))).astype(np.float32)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opacities = (1 / (1 + np.exp(-rng.normal(0.5, 1.0, (n,))))).astype(np.float32)
    shs = rng.normal(0, 0.4, (n, 16, 3)).astype(np.float32)
    shs[:, 0] += 0.8
    return means, scales, q, opacities, shs


def look_at_camera(width=96, height=64, fovx=0.9, fovy=0.7, angle=0.0):
    R = np.eye(3, dtype=np.float32)   # camera at origin looking +z
    if angle:
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T = np.zeros(3, dtype=np.float32)
    return Camera.create(R, T, fovx, fovy, width, height)
