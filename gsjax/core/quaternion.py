"""Quaternion utilities (wxyz convention, matching the reference's (r,x,y,z)).

Equivalent to `utils/general_utils.py:build_rotation/build_scaling_rotation`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[.., 4] unit quaternion (w,x,y,z) -> [.., 3, 3] rotation matrix.

    Rows follow `utils/general_utils.py:build_rotation` — R maps gaussian-local
    coordinates to world: world_dir = R @ local_dir.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_covariance(scaling: jnp.ndarray, rotation: jnp.ndarray,
                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3x3 covariance from per-gaussian scale + quaternion.

    Sigma = R diag(s^2) R^T (reference: build_scaling_rotation then L L^T,
    scene/gaussian_model.py:46-50)."""
    R = to_rotation_matrix(rotation)
    S = scaling * scale_modifier
    RS = R * S[..., None, :]
    return jnp.einsum("...ij,...kj->...ik", RS, RS, precision=jax.lax.Precision.HIGHEST)
