"""Brute-force numpy oracle for the rasterizer.

Independent re-implementation of the CUDA semantics (render_forward.cu) in
straightforward per-pixel numpy: no tiles-chunking, no log-space cumsum — a
direct sequential transmittance march per pixel, plus the SPLIT-way median
depth bisection. Used as ground truth for the XLA/Pallas renderers.
"""

from __future__ import annotations

import math

import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def quat_to_rot(q):
    r, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def eval_sh_np(deg, sh, d):
    res = C0 * sh[0]
    if deg > 0:
        x, y, z = d
        res = res - C1 * y * sh[1] + C1 * z * sh[2] - C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (res + C2[0] * xy * sh[4] + C2[1] * yz * sh[5]
                   + C2[2] * (2 * zz - xx - yy) * sh[6]
                   + C2[3] * xz * sh[7] + C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                res = (res + C3[0] * y * (3 * xx - yy) * sh[9]
                       + C3[1] * xy * z * sh[10]
                       + C3[2] * y * (4 * zz - xx - yy) * sh[11]
                       + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                       + C3[4] * x * (4 * zz - xx - yy) * sh[13]
                       + C3[5] * z * (xx - yy) * sh[14]
                       + C3[6] * x * (xx - 3 * yy) * sh[15])
    return res


def preprocess_np(means, scales, quats, opacities, shs, cam, sh_degree,
                  kernel_size=0.0, scale_modifier=1.0, tile=32,
                  sg_axis=None, sg_sharpness=None, sg_color=None, sg_degree=0):
    """Returns a list of per-gaussian dicts (None for culled)."""
    wv = np.asarray(cam.world_view, dtype=np.float64)
    full = np.asarray(cam.full_proj, dtype=np.float64)
    campos = np.asarray(cam.campos, dtype=np.float64)
    fx, fy = float(cam.fx), float(cam.fy)
    tanx, tany = float(cam.tan_fovx), float(cam.tan_fovy)
    W, H = cam.width, cam.height
    tiles_x = -(-W // tile)
    tiles_y = -(-H // tile)
    out = []
    for i in range(means.shape[0]):
        p = means[i].astype(np.float64)
        pv = wv[:3, :3] @ p + wv[:3, 3]
        if pv[2] <= 0.2:
            out.append(None)
            continue
        ph = full[:3, :3] @ p + full[:3, 3]
        pw = full[3, :3] @ p + full[3, 3]
        pp = ph / (pw + 1e-7)
        tc = np.linalg.norm(pv)
        u = np.clip(pv[0] / pv[2], -1.3 * tanx, 1.3 * tanx)
        v = np.clip(pv[1] / pv[2], -1.3 * tany, 1.3 * tany)
        tx, ty, tz = u * pv[2], v * pv[2], pv[2]
        l = math.sqrt(tx * tx + ty * ty + tz * tz)

        q = quats[i] / np.linalg.norm(quats[i])
        Rg = quat_to_rot(q)
        s = scales[i].astype(np.float64) * scale_modifier
        sigma_w = Rg @ np.diag(s ** 2) @ Rg.T
        Rwc = wv[:3, :3]
        sigma_c = Rwc @ sigma_w @ Rwc.T
        sigma_c_inv = Rwc @ Rg @ np.diag(1.0 / s ** 2) @ Rg.T @ Rwc.T

        A = np.array([[fx / tz, 0, -fx * tx / tz ** 2],
                      [0, fy / tz, -fy * ty / tz ** 2]])
        cov2 = A @ sigma_c @ A.T
        det_raw = max(1e-6, cov2[0, 0] * cov2[1, 1] - cov2[0, 1] ** 2)
        cx_, cy_, cz_ = cov2[0, 0] + kernel_size, cov2[0, 1], cov2[1, 1] + kernel_size
        det_dil = max(1e-6, cx_ * cz_ - cy_ ** 2)
        coef = math.sqrt(det_raw / det_dil)
        det = cx_ * cz_ - cy_ ** 2
        if det <= 0:
            out.append(None)
            continue
        conic = np.array([cz_ / det, -cy_ / det, cx_ / det])
        mid = 0.5 * (cx_ + cz_)
        lam = mid + math.sqrt(max(0.1, mid * mid - det))
        radius = math.ceil(3 * math.sqrt(lam))
        px = ((pp[0] + 1) * W - 1) * 0.5
        py = ((pp[1] + 1) * H - 1) * 0.5
        rx0 = min(tiles_x, max(0, int((px - radius) / tile)))
        ry0 = min(tiles_y, max(0, int((py - radius) / tile)))
        rx1 = min(tiles_x, max(0, int((px + radius + tile - 1) / tile)))
        ry1 = min(tiles_y, max(0, int((py + radius + tile - 1) / tile)))
        if (rx1 - rx0) * (ry1 - ry0) == 0:
            out.append(None)
            continue

        uvh = np.array([u, v, 1.0])
        m = sigma_c_inv @ uvh
        vb = m @ uvh
        ray_len2 = u * u + v * v + 1
        factor = l / ray_len2
        plane0 = ((v * v + 1) * m[0] - u * v * m[1]) / vb
        plane1 = (-u * v * m[0] + (u * u + 1) * m[1]) / vb
        rsigma = math.sqrt(max(vb, 0.0) / ray_len2)
        ray_plane = np.array([plane0 * factor / fx, plane1 * factor / fy, tc, rsigma])
        rnv = np.array([-plane0 * factor, -plane1 * factor, -1.0])
        nJ = np.array([[1 / tz, 0, -tx / tz ** 2],
                       [0, 1 / tz, -ty / tz ** 2],
                       [tx / l, ty / l, tz / l]])
        nvec = nJ @ rnv
        normal = nvec / np.linalg.norm(nvec)

        d = p - campos
        d = d / np.linalg.norm(d)
        color = eval_sh_np(sh_degree, shs[i].astype(np.float64), d)
        if sg_degree and sg_axis is not None:
            for g in range(sg_degree):
                ax = sg_axis[i, g] / max(np.linalg.norm(sg_axis[i, g]), 1e-12)
                color = color + sg_color[i, g] * math.exp(
                    sg_sharpness[i, g] * (ax @ d - 1.0))
        color = np.maximum(color + 0.5, 0.0)

        out.append(dict(mean2d=np.array([px, py]), depth=tc, radius=radius,
                        conic=conic, opacity=float(opacities[i]) * coef,
                        color=color, ray_plane=ray_plane, normal=normal,
                        rect=(rx0, ry0, rx1, ry1)))
    return out


def render_np(prep, cam, bg, tile=32, require_depth=True,
              split=8, split_iters=5, sample_range=0.4, min_transmittance=0.45):
    W, H = cam.width, cam.height
    fx, fy = float(cam.fx), float(cam.fy)
    tiles_x = -(-W // tile)
    color = np.zeros((H, W, 3))
    alpha = np.zeros((H, W))
    normal = np.zeros((H, W, 3))
    mdepth = np.zeros((H, W))
    ncontrib = np.zeros((H, W), np.int32)

    # per-tile sorted lists (same construction as duplicateWithKeys), with
    # the binning.py exact ellipse-tile cull mirrored: a (gaussian, tile)
    # pair whose box-min of q = 0.5*ca*dx^2 + cb*dx*dy + 0.5*cc*dy^2 over
    # the tile's pixel box exceeds ln(op/alpha_min) (+ the same 1e-3 margin)
    # fails every pixel's alpha test, so dropping it changes nothing but the
    # n_contrib list index.
    def tile_dead(g, txx, tyy):
        gx, gy = g["mean2d"]
        ca, cb, cc = g["conic"]
        axx = gx - (txx * tile + tile - 1)
        bxx = gx - txx * tile
        ayy = gy - (tyy * tile + tile - 1)
        byy = gy - tyy * tile
        if axx <= 0 <= bxx and ayy <= 0 <= byy:
            return False
        q = lambda dx, dy: 0.5 * ca * dx * dx + cb * dx * dy + 0.5 * cc * dy * dy
        clamp = lambda v, lo, hi: min(max(v, lo), hi)
        qmin = min(
            q(axx, clamp(-cb * axx / max(cc, 1e-12), ayy, byy)),
            q(bxx, clamp(-cb * bxx / max(cc, 1e-12), ayy, byy)),
            q(clamp(-cb * ayy / max(ca, 1e-12), axx, bxx), ayy),
            q(clamp(-cb * byy / max(ca, 1e-12), axx, bxx), byy))
        return qmin > math.log(max(g["opacity"], 1e-12) / (1 / 255)) + 1e-3

    tiles = {}
    order = sorted((i for i, g in enumerate(prep) if g is not None),
                   key=lambda i: prep[i]["depth"])
    for i in order:
        g = prep[i]
        rx0, ry0, rx1, ry1 = g["rect"]
        for tyy in range(ry0, ry1):
            for txx in range(rx0, rx1):
                if tile_dead(g, txx, tyy):
                    continue
                tiles.setdefault(tyy * tiles_x + txx, []).append(i)

    for py in range(H):
        for px in range(W):
            tid = (py // tile) * tiles_x + (px // tile)
            glist = tiles.get(tid, [])
            T = 1.0
            C = np.zeros(3)
            N = np.zeros(3)
            md_init = 0.0
            last = 0
            contributor = 0
            applied = []
            for i in glist:
                contributor += 1
                g = prep[i]
                dx = g["mean2d"][0] - px
                dy = g["mean2d"][1] - py
                a_, b_, c_ = g["conic"]
                power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
                if power > 0:
                    continue
                al = min(0.99, g["opacity"] * math.exp(power))
                if al < 1 / 255:
                    continue
                test_T = T * (1 - al)
                if test_T < 1e-4:
                    break
                aT = al * T
                C += g["color"] * aT
                t = g["ray_plane"][0] * dx + g["ray_plane"][1] * dy + g["ray_plane"][2]
                N += g["normal"] * aT
                if T > 0.5:
                    md_init = t
                T = test_T
                last = contributor
                applied.append((al, t, g["ray_plane"][3]))
            ncontrib[py, px] = last
            color[py, px] = C + T * np.asarray(bg)
            alpha[py, px] = 1 - T
            if last > 0:
                normal[py, px] = N / (1 - T)

            if require_depth:
                in_range = T <= min_transmittance
                dmin = max(md_init - sample_range, 0.0)
                dmax = max(md_init + sample_range, 0.0)
                T0 = T1 = 0.0
                for it in range(split_iters):
                    ivl = (dmax - dmin) / split
                    Tp = np.ones(split + 1)
                    for s in range(split + 1):
                        ts = dmin + ivl * s
                        acc = 1.0
                        for (al, tpk, rs) in applied:
                            gg = math.exp(-0.5 * ((ts - tpk) * rs) ** 2) if rs > 0 else 0.0
                            om = 1 - al * gg
                            f = (1 - al) / math.sqrt(om) if ts > tpk else math.sqrt(om)
                            acc *= f
                        Tp[s] = acc
                    if it == 0:
                        in_range = in_range and Tp[0] >= 0.5 and Tp[split] <= 0.5
                    sid = 0
                    for s in range(1, split):
                        if Tp[s] >= 0.5:
                            sid = s
                    dmax = dmin + (sid + 1) * ivl
                    dmin = dmin + sid * ivl
                    T0, T1 = Tp[sid], Tp[sid + 1]
                if T0 - T1 != 0:
                    wmax = min(max((T0 - 0.5) / (T0 - T1), 0.0), 1.0)
                else:
                    wmax = 0.0
                md = wmax * dmax + (1 - wmax) * dmin if in_range else 0.0
                pnx = (px - (W - 1) / 2) / fx
                pny = (py - (H - 1) / 2) / fy
                mdepth[py, px] = md / math.sqrt(pnx * pnx + pny * pny + 1)

    return dict(render=color, alpha=alpha, normal=normal,
                median_depth=mdepth, n_contrib=ncontrib)
