"""Spherical-Gaussian appearance term.

Equivalent to the SG loop in `computeColorFromSHSG` (render_forward.cu:62-70):
each of `degree` active lobes adds `color_g * exp(sharpness_g * (axis_g . dir - 1))`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eval_sg(degree: int, sg_axis: jnp.ndarray, sg_sharpness: jnp.ndarray,
            sg_color: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the spherical-Gaussian colour contribution.

    Args:
      degree: number of active lobes (static; 0 -> zeros).
      sg_axis: [N, G, 3] unit lobe axes.
      sg_sharpness: [N, G] lobe sharpness (post-softplus).
      sg_color: [N, G, 3] lobe colours.
      dirs: [N, 3] unit view directions.

    Returns: [N, 3] colour contribution.
    """
    if degree <= 0:
        return jnp.zeros(dirs.shape, dtype=dirs.dtype)
    axis = sg_axis[:, :degree]            # [N, g, 3]
    sharp = sg_sharpness[:, :degree]      # [N, g]
    color = sg_color[:, :degree]          # [N, g, 3]
    hp = jax.lax.Precision.HIGHEST
    cos = jnp.einsum("ngk,nk->ng", axis, dirs, precision=hp)
    lobe = jnp.exp(sharp * (cos - 1.0))   # [N, g]
    return jnp.einsum("ng,ngk->nk", lobe, color, precision=hp)
