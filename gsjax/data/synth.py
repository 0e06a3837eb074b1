"""Consistent synthetic datasets: views RENDERED from a known gaussian set.

Unlike `tests.test_data.write_synthetic_colmap` (random-noise images, no
cross-view structure), this produces a photometrically consistent COLMAP
scene, so the multi-view (NCC / geometric) losses have real signal —
mirrors how the reference is exercised on real captures.

Two generators:
  - `make_gaussians` + `arc_pose`: a volumetric blob on a camera arc (the
    unit-test scene — fast, engages every loss term).
  - `sphere_gaussians` + `ring_pose`: flattened gaussians ON a unit sphere
    viewed from a full camera ring — known analytic surface, so a trained
    model's extracted mesh has a ground-truth chamfer distance
    (scripts/golden_quality.py tracks PSNR + chamfer across rounds in lieu
    of the DTU/TnT datasets, which are not in the image).
"""

from __future__ import annotations

import os
import struct

import numpy as np


def _rotmat2qvec(R):
    """COLMAP (w,x,y,z) quaternion from a rotation matrix."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    w, v = np.linalg.eigh(K)
    q = v[[3, 0, 1, 2], np.argmax(w)]
    return -q if q[0] < 0 else q


def make_gaussians(n=250, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    means[:, 2] *= 0.4
    scales = rng.uniform(0.06, 0.16, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.7, 0.95, (n, 1)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1.0, 1.5, (n, 3))
    return means, scales, quats, opac, shs


def sphere_gaussians(n=1500, seed=0, radius=1.0):
    """Flattened gaussians tangent to a unit sphere — a known surface.

    Each gaussian sits on the sphere, its two long axes tangent and the
    short axis along the outward normal (scale ratio ~8:1), the same regime
    PGSR's planarisation drives real scenes toward. Colour varies smoothly
    with the normal so NVS/NCC have gradient signal.
    """
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 1, (n, 3))
    nrm = v / np.linalg.norm(v, axis=1, keepdims=True)
    means = (radius * nrm).astype(np.float32)

    # tangent frame per point
    a = np.where(np.abs(nrm[:, 2:3]) < 0.9,
                 np.array([[0.0, 0.0, 1.0]]), np.array([[1.0, 0.0, 0.0]]))
    t1 = np.cross(nrm, a)
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(nrm, t1)
    # columns = principal axes (x,y tangent, z normal)
    rot = np.stack([t1, t2, nrm], axis=2)            # [n,3,3]
    quats = np.stack([_rotmat2qvec(r) for r in rot]).astype(np.float32)

    area = 4 * np.pi * radius**2 / n
    tang = np.sqrt(area) * 0.9
    scales = np.stack([
        np.full(n, tang), np.full(n, tang), np.full(n, tang / 8.0)],
        axis=1).astype(np.float32) * rng.uniform(0.8, 1.25, (n, 1))
    opac = rng.uniform(0.85, 0.98, (n, 1)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    base = 0.5 + 0.45 * np.stack([nrm[:, 0], nrm[:, 1],
                                  np.abs(nrm[:, 2])], axis=1)
    shs[:, 0] = ((base - 0.5) / 0.282).astype(np.float32)
    return (means, scales, quats.astype(np.float32), opac, shs)


BLOBS_CENTERS = ((0.0, 0.0, 0.0), (1.5, 0.2, 0.5))
BLOBS_RADII = (1.0, 0.55)
BLOBS_BG_RADIUS = 6.0


def blobs_gaussians(n=2600, seed=0):
    """Harder golden scene: two disjoint spheres (the small one occludes the
    big one from part of the ring) plus a textured enclosing background
    sphere, with ANISOTROPIC tangent scales (up to ~4:1 in-plane) and
    high-frequency spatial colour — exercising occlusion boundaries,
    anisotropy and texture where the plain sphere scene is easy.

    Ground truth for chamfer is the union of the two foreground spheres
    (`blobs_surface_distance` / `blobs_surface_samples`); the background
    sphere is cropped away before evaluation (|v| <= 2.5)."""
    rng = np.random.default_rng(seed)
    parts = []
    n_fg = int(n * 0.75)
    counts = [int(n_fg * 0.72), n_fg - int(n_fg * 0.72), n - n_fg]
    radii = list(BLOBS_RADII) + [BLOBS_BG_RADIUS]
    centers = [np.asarray(c, np.float32) for c in BLOBS_CENTERS] + \
        [np.zeros(3, np.float32)]
    for (cnt, radius, center) in zip(counts, radii, centers):
        v = rng.normal(0, 1, (cnt, 3))
        nrm = v / np.linalg.norm(v, axis=1, keepdims=True)
        means = (radius * nrm + center).astype(np.float32)
        a = np.where(np.abs(nrm[:, 2:3]) < 0.9,
                     np.array([[0.0, 0.0, 1.0]]), np.array([[1.0, 0.0, 0.0]]))
        t1 = np.cross(nrm, a)
        t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
        t2 = np.cross(nrm, t1)
        rot = np.stack([t1, t2, nrm], axis=2)
        quats = np.stack([_rotmat2qvec(r) for r in rot]).astype(np.float32)
        area = 4 * np.pi * radius**2 / cnt
        tang = np.sqrt(area) * 0.9
        aniso = rng.uniform(0.5, 2.0, (cnt, 1))     # in-plane ratio up to 4:1
        scales = np.stack([
            np.full(cnt, tang) * aniso[:, 0],
            np.full(cnt, tang) / aniso[:, 0],
            np.full(cnt, tang / 8.0)], axis=1).astype(np.float32) \
            * rng.uniform(0.8, 1.25, (cnt, 1)).astype(np.float32)
        opac = rng.uniform(0.85, 0.98, (cnt, 1)).astype(np.float32)
        shs = np.zeros((cnt, 16, 3), np.float32)
        # high-frequency spatial texture (deterministic in world position)
        m = means
        base = 0.5 + 0.22 * np.stack([
            np.sin(5.1 * m[:, 0]) * np.cos(4.3 * m[:, 1]),
            np.sin(4.7 * m[:, 1] + 1.2) * np.cos(5.6 * m[:, 2]),
            np.sin(6.2 * m[:, 2] + 0.4) * np.cos(3.9 * m[:, 0])], axis=1)
        shs[:, 0] = ((base - 0.5) / 0.282).astype(np.float32)
        parts.append((means, scales, quats, opac, shs))
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(5))


def blobs_surface_distance(verts):
    """Unsigned distance of each vertex to the union of the two foreground
    spheres."""
    d = np.full(len(verts), np.inf)
    for c, r in zip(BLOBS_CENTERS, BLOBS_RADII):
        d = np.minimum(d, np.abs(
            np.linalg.norm(verts - np.asarray(c), axis=1) - r))
    return d


def blobs_surface_samples(n=20000, seed=0):
    """Area-weighted uniform samples on the two foreground spheres."""
    rng = np.random.default_rng(seed)
    areas = np.asarray([r * r for r in BLOBS_RADII], np.float64)
    counts = (n * areas / areas.sum()).astype(int)
    out = []
    for (c, r, cnt) in zip(BLOBS_CENTERS, BLOBS_RADII, counts):
        s = rng.normal(0, 1, (cnt, 3))
        s /= np.linalg.norm(s, axis=1, keepdims=True)
        out.append(r * s + np.asarray(c))
    return np.concatenate(out)


def ring_pose(i, n, radius=3.2, height_amp=0.9, target=(0.0, 0.0, 0.0)):
    """Full 360-degree camera ring with alternating elevation: enough
    coverage that TSDF fusion closes the sphere."""
    ang = 2 * np.pi * i / n
    h = height_amp * np.sin(3.0 * ang)
    pos = np.array([radius * np.sin(ang), h, -radius * np.cos(ang)])
    fwd = np.asarray(target) - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])     # COLMAP y is down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    r_w2c = np.stack([right, down, fwd])
    tvec = -r_w2c @ pos
    return r_w2c, tvec


def arc_pose(i, n, radius=3.5, target=(0.0, 0.0, 0.0)):
    """World->cam rotation (COLMAP row convention) + tvec for pose i."""
    ang = (i / max(n - 1, 1) - 0.5) * 0.9
    h = 0.3 * np.sin(2.1 * i)
    pos = np.array([radius * np.sin(ang), h, -radius * np.cos(ang)])
    fwd = np.asarray(target) - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])     # COLMAP y is down
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    r_w2c = np.stack([right, down, fwd])
    tvec = -r_w2c @ pos
    return r_w2c, tvec


def write_rendered_colmap(root, n_images=6, width=96, height=64,
                          n_gauss=250, seed=0, backend="auto",
                          gaussians=None, pose_fn=None, points_noise=0.0,
                          pair_capacity=1 << 15, max_per_tile=1 << 9):
    """Render a known gaussian scene from an arc of poses and save it as a
    binary COLMAP dataset. Returns the gaussian tuple used.

    `gaussians` overrides the default blob scene (a 5-tuple as returned by
    make_gaussians/sphere_gaussians); `pose_fn(i, n)` overrides arc_pose;
    `points_noise` jitters the exported sparse points3D (so training does
    not start from the exact answer)."""
    import dataclasses

    import jax.numpy as jnp
    from PIL import Image

    from gsjax.ops.raster import RasterConfig, render
    from gsjax.ops.raster.camera import Camera

    sparse = os.path.join(root, "sparse", "0")
    imgdir = os.path.join(root, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(imgdir, exist_ok=True)
    fx = fy = 0.9 * width
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))   # PINHOLE
        f.write(np.array([fx, fy, width / 2, height / 2], "<f8").tobytes())

    g = make_gaussians(n_gauss, seed) if gaussians is None else gaussians
    if pose_fn is None:
        pose_fn = arc_pose
    means, scales, quats, opac, shs = g
    fovx = 2 * np.arctan(width / (2 * fx))
    fovy = 2 * np.arctan(height / (2 * fy))
    cfg = RasterConfig(pair_capacity=pair_capacity, max_per_tile=max_per_tile,
                       sh_degree=0, require_depth=False, backend=backend)
    args = tuple(map(jnp.asarray, g))
    bg = jnp.zeros(3)

    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            r_w2c, tvec = pose_fn(i, n_images)
            cam = Camera.create(r_w2c.T, tvec, fovx, fovy, width, height)
            out = render(*args, cam, cfg, bg)
            img = np.clip(np.asarray(out["render"]), 0, 1)
            q = _rotmat2qvec(r_w2c)
            f.write(struct.pack("<i", i + 1))
            f.write(q.astype("<f8").tobytes())
            f.write(tvec.astype("<f8").tobytes())
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(imgdir, f"img_{i:03d}.png"))

    sub = means[::3]
    if points_noise > 0:
        sub = sub + np.random.default_rng(seed + 1).normal(
            0, points_noise, sub.shape).astype(np.float32)
    cols = np.clip(shs[::3, 0] * 0.282 + 0.5, 0, 1)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(sub)))
        for i, p in enumerate(sub):
            f.write(struct.pack("<Q", i))
            f.write(p.astype("<f8").tobytes())
            f.write((cols[i] * 255).astype("u1").tobytes())
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(np.zeros(4, "<i4").tobytes())
    return g
