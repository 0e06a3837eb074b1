"""Per-Gaussian preprocess: projection, 2D covariance with Mip-Splatting
dilation, RaDe-GS ray-plane & normal, SH+SG colour, tile footprint.

TPU-native re-derivation of `preprocessCUDA` / `computeCov2D`
(render_forward.cu:81-386): one fused batch of vectorised [N]-ops (VPU
friendly, no per-thread kernel), math re-expressed in plain row-vector
convention instead of glm column-major.

Derivation notes (matching render_forward.cu:81-243):
  - J is the EWA projection Jacobian rows
      [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]
    evaluated at the fov-clamped view point.
  - camera-frame covariance  Sigma_cam = Rwc Sigma_world Rwc^T,
    cov2D = J Sigma_cam J^T + kernel_size * I  (Mip-Splatting dilation),
    opacity coefficient = sqrt(det(cov2D_raw)/det(cov2D_dilated)).
  - Sigma_cam^{-1} = V V^T with V = Rwc R_gauss diag(1/s); uvh = (u,v,1);
    m = Sigma_cam^{-1} uvh; vb = uvh . m.  The per-pixel blend depth is
      t(pix) = rp0*(gx-px) + rp1*(gy-py) + rp2
    with rp = (plane0*f/fx, plane1*f/fy, |t_view|), f = l/(u^2+v^2+1),
    plane = nJ_inv m / vb; rsigma = sqrt(vb/(u^2+v^2+1)) is the inverse
    1-sigma extent of the gaussian along the ray (used by the median-depth
    CDF, render_forward.cu:610-620).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gsjax.core import quaternion, sg, sh
from gsjax.core.transforms import ndc_to_pix
from gsjax.ops.raster.camera import Camera
from gsjax.ops.raster.config import RasterConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preprocessed:
    """Per-Gaussian screen-space quantities ([N] leading dim)."""
    mean2d: jax.Array       # [N,2] pixel-space centre
    depth: jax.Array        # [N]   |p_view| (sort key, render_forward.cu:380)
    radius: jax.Array       # [N]   int32 screen radius (0 => culled)
    conic: jax.Array        # [N,3] inverse 2D covariance (a,b,c)
    opacity: jax.Array      # [N]   opacity * mip coefficient
    color: jax.Array        # [N,3] SH+SG colour (clamped >= 0)
    ray_plane: jax.Array    # [N,4] (rp0, rp1, tc, rsigma)
    normal: jax.Array       # [N,3] camera-space unit normal
    rect_min: jax.Array     # [N,2] int32 tile rect (x,y) inclusive
    rect_wh: jax.Array      # [N,2] int32 tile rect extent
    tiles_touched: jax.Array  # [N] int32
    valid: jax.Array        # [N] bool


def preprocess(means3d: jax.Array,
               scales: jax.Array,
               rotations: jax.Array,
               opacities: jax.Array,
               shs: jax.Array,
               sg_axis: jax.Array | None,
               sg_sharpness: jax.Array | None,
               sg_color: jax.Array | None,
               camera: Camera,
               cfg: RasterConfig,
               alive: jax.Array | None = None) -> Preprocessed:
    """Vectorised preprocess over all (padded) gaussians.

    Args mirror `GaussianRasterizer.forward` inputs
    (diff_gaussian_rasterization/__init__.py:272-483): `scales`/`opacities`
    are post-activation and already 3D-filtered; `rotations` are raw (will be
    normalised here); `alive` masks padding slots of the fixed-capacity model.
    """
    n = means3d.shape[0]
    f32 = jnp.float32
    # All contractions here are tiny (K<=4); force f32 accumulation — the TPU
    # default bf16 matmul precision loses ~3 decimal digits, which is fatal for
    # projection / covariance math.
    hp = jax.lax.Precision.HIGHEST
    ein = partial(jnp.einsum, precision=hp)
    wv = camera.world_view
    R_wc = wv[:3, :3]

    # --- view/clip transforms -------------------------------------------------
    p_view = ein("ni,ji->nj", means3d, R_wc) + wv[:3, 3]
    tz = p_view[:, 2]
    in_front = tz > cfg.near_plane  # in_frustum, auxiliary.h:133-153

    p_hom = ein("ni,ji->nj", means3d, camera.full_proj[:3, :3]) + camera.full_proj[:3, 3]
    p_w = ein("ni,i->n", means3d, camera.full_proj[3, :3]) + camera.full_proj[3, 3]
    p_proj = p_hom / (p_w[:, None] + 1e-7)

    # guard tz for the division-heavy math below; culled rows are masked out.
    tz_safe = jnp.where(in_front, tz, 1.0)
    tc = jnp.linalg.norm(p_view, axis=-1)  # ray distance of the centre

    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    u = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    v = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    txc = u * tz_safe
    tyc = v * tz_safe
    l = jnp.sqrt(txc * txc + tyc * tyc + tz_safe * tz_safe)

    # --- world covariance & camera-frame inverse -----------------------------
    q = quaternion.normalize(rotations)
    R_g = quaternion.to_rotation_matrix(q)                # local->world
    s = scales * cfg.scale_modifier
    s_safe = jnp.maximum(s, 1e-12)
    RS = R_g * s[:, None, :]                              # [N,3,3]
    sigma_world = ein("nij,nkj->nik", RS, RS)
    sigma_cam = ein("ij,njk,lk->nil", R_wc, sigma_world, R_wc)
    V = ein("ij,njk->nik", R_wc, R_g) / s_safe[:, None, :]
    sigma_cam_inv = ein("nij,nkj->nik", V, V)

    # --- 2D covariance via EWA Jacobian (fov-clamped point) ------------------
    fx, fy = camera.fx, camera.fy
    j00 = fx / tz_safe
    j11 = fy / tz_safe
    j02 = -fx * txc / (tz_safe * tz_safe)
    j12 = -fy * tyc / (tz_safe * tz_safe)
    # rows of A = [[j00, 0, j02], [0, j11, j12]]
    a_row0 = jnp.stack([j00, jnp.zeros_like(j00), j02], axis=-1)
    a_row1 = jnp.stack([jnp.zeros_like(j11), j11, j12], axis=-1)
    sa0 = ein("nij,nj->ni", sigma_cam, a_row0)
    sa1 = ein("nij,nj->ni", sigma_cam, a_row1)
    c_xx = ein("ni,ni->n", a_row0, sa0)
    c_xy = ein("ni,ni->n", a_row0, sa1)
    c_yy = ein("ni,ni->n", a_row1, sa1)

    det_raw = jnp.maximum(1e-6, c_xx * c_yy - c_xy * c_xy)
    cov_x = c_xx + cfg.kernel_size
    cov_y = c_xy
    cov_z = c_yy + cfg.kernel_size
    det_dil = jnp.maximum(1e-6, cov_x * cov_z - cov_y * cov_y)
    mip_coef = jnp.sqrt(det_raw / det_dil)

    det = cov_x * cov_z - cov_y * cov_y
    det_ok = det > 0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cov_z / det_safe, -cov_y / det_safe, cov_x / det_safe], axis=-1)

    # --- screen footprint ----------------------------------------------------
    mid = 0.5 * (cov_x + cov_z)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))
    px = ndc_to_pix(p_proj[:, 0], camera.width)
    py = ndc_to_pix(p_proj[:, 1], camera.height)
    mean2d = jnp.stack([px, py], axis=-1)

    tiles_x, tiles_y = cfg.grid(camera.width, camera.height)
    t_sz = f32(cfg.tile)
    rx_min = jnp.clip(jnp.floor((px - radius_f) / t_sz), 0, tiles_x).astype(jnp.int32)
    ry_min = jnp.clip(jnp.floor((py - radius_f) / t_sz), 0, tiles_y).astype(jnp.int32)
    rx_max = jnp.clip(jnp.floor((px + radius_f + t_sz - 1) / t_sz), 0, tiles_x).astype(jnp.int32)
    ry_max = jnp.clip(jnp.floor((py + radius_f + t_sz - 1) / t_sz), 0, tiles_y).astype(jnp.int32)
    rect_w = rx_max - rx_min
    rect_h = ry_max - ry_min
    area = rect_w * rect_h

    valid = in_front & det_ok & (area > 0)
    if alive is not None:
        valid = valid & alive
    area = jnp.where(valid, area, 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # --- RaDe-GS ray-plane & normal ------------------------------------------
    uvh = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
    m = ein("nij,nj->ni", sigma_cam_inv, uvh)
    vb = ein("ni,ni->n", m, uvh)
    vb_safe = jnp.where(jnp.abs(vb) > 1e-20, vb, 1e-20)
    ray_len2 = u * u + v * v + 1.0
    factor = l / ray_len2
    plane0 = ((v * v + 1.0) * m[:, 0] - u * v * m[:, 1]) / vb_safe
    plane1 = (-u * v * m[:, 0] + (u * u + 1.0) * m[:, 1]) / vb_safe
    rsigma = jnp.sqrt(jnp.maximum(vb, 0.0) / ray_len2)
    ray_plane = jnp.stack([plane0 * factor / fx, plane1 * factor / fy, tc, rsigma], axis=-1)

    rnv0 = -plane0 * factor
    rnv1 = -plane1 * factor
    # nJ rows: [[1/tz,0,-tx/tz^2],[0,1/tz,-ty/tz^2],[tx/l,ty/l,tz/l]]
    n0 = rnv0 / tz_safe + txc / (tz_safe * tz_safe)
    n1 = rnv1 / tz_safe + tyc / (tz_safe * tz_safe)
    n2 = (rnv0 * txc + rnv1 * tyc - tz_safe) / l
    nvec = jnp.stack([n0, n1, n2], axis=-1)
    nnorm = jnp.maximum(jnp.linalg.norm(nvec, axis=-1, keepdims=True), 1e-12)
    normal = nvec / nnorm

    # --- appearance -----------------------------------------------------------
    dirs = means3d - camera.campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    color = sh.eval_sh(cfg.sh_degree, shs, dirs)
    if cfg.sg_degree > 0:
        color = color + sg.eval_sg(cfg.sg_degree, sg_axis, sg_sharpness, sg_color, dirs)
    color = jnp.maximum(color + 0.5, 0.0)

    depth = jnp.where(valid, tc, jnp.inf)

    return Preprocessed(
        mean2d=mean2d,
        depth=depth.astype(f32),
        radius=radius,
        conic=conic.astype(f32),
        opacity=(opacities.reshape(n) * mip_coef).astype(f32),
        color=color.astype(f32),
        ray_plane=ray_plane.astype(f32),
        normal=normal.astype(f32),
        rect_min=jnp.stack([rx_min, ry_min], axis=-1),
        rect_wh=jnp.stack([rect_w, rect_h], axis=-1),
        tiles_touched=area.astype(jnp.int32),
        valid=valid,
    )
