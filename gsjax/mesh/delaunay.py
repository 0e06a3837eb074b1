"""Delaunay tetrahedralisation.

Replaces the CGAL `tetra_triangulation` submodule (src/triangulation.cpp:21-65,
py_binding.cpp:25-40) with Qhull via scipy (native C, host-side, exactly like
the reference's CPU round-trip). The optional C++ extension in gsjax/cpp
provides the same entry point when built.
"""

from __future__ import annotations

import numpy as np


def triangulate(points: np.ndarray) -> np.ndarray:
    """[N,3] float -> [T,4] int32 tetrahedra indices."""
    from scipy.spatial import Delaunay

    tri = Delaunay(np.asarray(points, np.float64), qhull_options="Qbb Qc Qz Q12")
    return tri.simplices.astype(np.int32)
