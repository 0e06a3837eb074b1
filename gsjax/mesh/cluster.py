"""Connected-component mesh cleanup.

Replaces open3d's `cluster_connected_triangles`-based `post_process_mesh`
(mesh_extract.py:15-37): triangles are clustered by shared vertices; clusters
smaller than max(largest_kth, 50) triangles are removed.
"""

from __future__ import annotations

import numpy as np


def cluster_triangles(faces: np.ndarray, n_vertices: int):
    """Label faces by connected component (shared-vertex adjacency)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    f = np.asarray(faces)
    rows = np.arange(len(f)).repeat(3)
    cols = f.reshape(-1)
    # face-vertex incidence; faces sharing a vertex are connected via B B^T
    b = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                   shape=(len(f), n_vertices))
    # vertices sharing a face are connected; a face's component is its
    # first vertex's component.
    _, vlabels = connected_components(b.T @ b, directed=False)
    return vlabels[f[:, 0]]


def post_process_mesh(vertices: np.ndarray, faces: np.ndarray,
                      cluster_to_keep: int = 1):
    """Keep the `cluster_to_keep` largest connected components (min 50 tris),
    drop unreferenced vertices. Returns (vertices, faces)."""
    if len(faces) == 0:
        return vertices, faces
    labels = cluster_triangles(faces, len(vertices))
    counts = np.bincount(labels)
    thresh = max(np.sort(counts)[-min(cluster_to_keep, len(counts))], 50)
    keep = counts[labels] >= thresh
    faces = faces[keep]
    used = np.unique(faces.reshape(-1))
    remap = np.full(len(vertices), -1, np.int64)
    remap[used] = np.arange(len(used))
    return vertices[used], remap[faces]
