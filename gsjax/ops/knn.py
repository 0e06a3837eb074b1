"""Initial-scale KNN: mean squared distance to the 3 nearest neighbours.

Functional equivalent of the `simple-knn` CUDA submodule (`spatial.cu:15-26`,
`simple_knn.cu`), used once at model init (`scene/gaussian_model.py:323`).
Host-side: scipy's cKDTree (native C) replaces the Morton-sorted box-rejection
search; for TPU-resident variants see `knn_jax` (exact, chunked O(N^2), fine
for <100k points).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


_NATIVE = None


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    try:
        import ctypes

        from gsjax.cpp.build import build_lib

        so = build_lib("simple_knn", ["simple_knn.cpp"])
        if so is None:
            _NATIVE = False
            return None
        lib = ctypes.CDLL(so)
        lib.mean_knn_dist2.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        _NATIVE = lib
        return lib
    except OSError:
        _NATIVE = False
        return None


def mean_knn_dist2(points: np.ndarray, k: int = 3) -> np.ndarray:
    """[N,3] -> [N] mean squared distance to the k nearest neighbours.

    Uses the native C++ KD-tree (gsjax/cpp/simple_knn.cpp) when the toolchain
    is available, else scipy's cKDTree."""
    import ctypes

    pts = np.ascontiguousarray(points, dtype=np.float32)
    lib = _load_native()
    if lib is not None:
        out = np.empty(len(pts), np.float32)
        lib.mean_knn_dist2(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(pts)), ctypes.c_int(k),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=k + 1, workers=-1)   # first hit is the point itself
    return np.mean(d[:, 1:] ** 2, axis=1).astype(np.float32)


def mean_knn_dist2_jax(points: jax.Array, k: int = 3, chunk: int = 1024) -> jax.Array:
    """Exact on-device variant (chunked O(N^2)); for tests / small scenes."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def body(_, i):
        q = jax.lax.dynamic_slice_in_dim(pts, i * chunk, chunk)        # [C,3]
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        idx = jnp.arange(n)[None, :]
        qidx = i * chunk + jnp.arange(chunk)[:, None]
        d2 = jnp.where(idx == qidx, jnp.inf, d2)
        top = -jax.lax.top_k(-d2, k)[0]                                 # [C,k]
        return None, jnp.mean(top, axis=-1)

    _, out = jax.lax.scan(body, None, jnp.arange(pts.shape[0] // chunk))
    return out.reshape(-1)[:n]
