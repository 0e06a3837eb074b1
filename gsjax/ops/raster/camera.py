"""Camera pytree consumed by the rasterizer.

Replaces `scene/cameras.py:20-74` + the GaussianRasterizationSettings plumbing
(`diff_gaussian_rasterization/__init__.py:254-269`). Width/height are static
metadata so jit specialises per resolution; matrices are plain math convention
(`world_view @ [p;1]`), not the reference's glm transposed-flat layout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.core import transforms


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    world_view: jax.Array        # [4,4] world -> camera
    full_proj: jax.Array         # [4,4] world -> clip (proj @ world_view)
    campos: jax.Array            # [3] camera center in world space
    fx: jax.Array                # focal in pixels
    fy: jax.Array
    cx: jax.Array                # principal point, (W-1)/2 per reference (cameras.py:51)
    cy: jax.Array
    tan_fovx: jax.Array
    tan_fovy: jax.Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
               width: int, height: int,
               znear: float = 0.01, zfar: float = 100.0,
               trans=None, scale: float = 1.0) -> "Camera":
        """Build from COLMAP-convention extrinsics (R: cam->world rotation,
        T: world->cam translation), mirroring `scene/cameras.py`."""
        wv = transforms.world_to_view(R, T, trans, scale)
        proj = transforms.projection_matrix(znear, zfar, fovx, fovy)
        full = proj @ wv
        c2w = np.linalg.inv(wv)
        # numpy leaves on purpose: cameras get closed over in jitted/shard_mapped
        # code, and device-array closure constants are fetched back host-side at
        # lowering — a multi-minute stall per constant over the axon relay.
        # numpy embeds into the MLIR directly (and converts on use otherwise).
        return Camera(
            world_view=np.asarray(wv, np.float32),
            full_proj=np.asarray(full, np.float32),
            campos=np.asarray(c2w[:3, 3], np.float32),
            fx=np.float32(transforms.fov2focal(fovx, width)),
            fy=np.float32(transforms.fov2focal(fovy, height)),
            cx=np.float32((width - 1) / 2),
            cy=np.float32((height - 1) / 2),
            tan_fovx=np.float32(math.tan(fovx * 0.5)),
            tan_fovy=np.float32(math.tan(fovy * 0.5)),
            width=int(width),
            height=int(height),
        )

    @staticmethod
    def from_matrices(width: int, height: int, fovx: float, fovy: float,
                      world_view: np.ndarray,
                      full_proj: np.ndarray) -> "Camera":
        """MiniCam equivalent (scene/cameras.py:77-89): build from explicit
        world->view and world->clip matrices in gsjax math convention
        (column vectors) — the live-viewer protocol path."""
        wv = np.asarray(world_view, np.float32)
        c2w = np.linalg.inv(wv)
        return Camera(
            world_view=wv,
            full_proj=np.asarray(full_proj, np.float32),
            campos=np.asarray(c2w[:3, 3], np.float32),
            fx=np.float32(transforms.fov2focal(fovx, width)),
            fy=np.float32(transforms.fov2focal(fovy, height)),
            cx=np.float32((width - 1) / 2),
            cy=np.float32((height - 1) / 2),
            tan_fovx=np.float32(math.tan(fovx * 0.5)),
            tan_fovy=np.float32(math.tan(fovy * 0.5)),
            width=int(width),
            height=int(height),
        )

    @property
    def view_rotation(self) -> jax.Array:
        """[3,3] world->camera rotation."""
        return self.world_view[:3, :3]
