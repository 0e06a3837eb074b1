"""Cross-backend parity for the initial-scale KNN (simple-knn equivalent).

The reference computes mean distance² to the 3 nearest neighbours on GPU
(`spatial.cu:15-26`); gsjax has three backends (native C++ KD-tree, scipy
cKDTree, chunked-jax exact). They must agree with a brute-force oracle.
"""

import numpy as np
import pytest

from gsjax.ops import knn as knn_mod
from gsjax.ops.knn import mean_knn_dist2, mean_knn_dist2_jax


def _oracle(pts, k=3):
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    d2.sort(axis=1)
    return d2[:, :k].mean(axis=1)


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    # clustered + uniform mix so nearest neighbours aren't degenerate
    a = rng.normal(0, 1, (300, 3))
    b = rng.normal(3, 0.05, (100, 3))
    return np.concatenate([a, b]).astype(np.float32)


def test_host_backend_matches_oracle(pts):
    got = mean_knn_dist2(pts)
    ref = _oracle(pts)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_native_and_scipy_agree(pts):
    lib = knn_mod._load_native()
    if lib is None:
        pytest.skip("native simple_knn not built (no toolchain)")
    native = mean_knn_dist2(pts)
    saved = knn_mod._NATIVE
    knn_mod._NATIVE = False   # force the scipy path
    try:
        scipy_out = mean_knn_dist2(pts)
    finally:
        knn_mod._NATIVE = saved
    np.testing.assert_allclose(native, scipy_out, rtol=1e-4, atol=1e-6)


def test_jax_backend_matches_oracle(pts):
    got = np.asarray(mean_knn_dist2_jax(pts, chunk=128))
    ref = _oracle(pts)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_k_parameter(pts):
    got = mean_knn_dist2(pts, k=1)
    ref_d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(ref_d2, np.inf)
    np.testing.assert_allclose(got, ref_d2.min(axis=1), rtol=1e-4, atol=1e-6)
