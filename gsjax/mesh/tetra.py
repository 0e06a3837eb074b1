"""Marching tetrahedra (kaolin-style case tables).

Numpy equivalent of `utils/tetmesh.py:50-190`: tets whose 4 corners are all
valid and have mixed SDF signs emit 1-2 triangles indexing unique
sign-crossing edges; returns the crossing edges' endpoint coords/sdfs/scales
so the caller can run the alpha-field binary search
(mesh_extract_tetrahedra.py:143-163) before placing final vertices.
"""

from __future__ import annotations

import numpy as np

TRIANGLE_TABLE = np.array([
    [-1, -1, -1, -1, -1, -1],
    [1, 0, 2, -1, -1, -1],
    [4, 0, 3, -1, -1, -1],
    [1, 4, 2, 1, 3, 4],
    [3, 1, 5, -1, -1, -1],
    [2, 3, 0, 2, 5, 3],
    [1, 4, 0, 1, 5, 4],
    [4, 2, 5, -1, -1, -1],
    [4, 5, 2, -1, -1, -1],
    [4, 1, 0, 4, 5, 1],
    [3, 2, 0, 3, 5, 2],
    [1, 3, 5, -1, -1, -1],
    [4, 1, 2, 4, 3, 1],
    [3, 0, 4, -1, -1, -1],
    [2, 0, 1, -1, -1, -1],
    [-1, -1, -1, -1, -1, -1],
], dtype=np.int64)

NUM_TRIANGLES = np.array([0, 1, 1, 2, 1, 2, 2, 1, 1, 2, 2, 1, 2, 1, 1, 0],
                         dtype=np.int64)
BASE_TET_EDGES = np.array([0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3], dtype=np.int64)


def marching_tetrahedra(vertices: np.ndarray, tets: np.ndarray, sdf: np.ndarray,
                        scales: np.ndarray, valid: np.ndarray):
    """Args: vertices [N,3], tets [T,4], sdf [N], scales [N], valid [N] bool.

    Returns (edge_verts [E,2,3], edge_sdf [E,2], edge_scales [E,2],
             faces [F,3] indexing edges, edge_ids [E,2])."""
    occ = sdf > 0
    occ4 = occ[tets]
    occ_sum = occ4.sum(-1)
    ok = (occ_sum > 0) & (occ_sum < 4) & valid[tets].all(-1)
    tets_v = tets[ok]

    all_edges = tets_v[:, BASE_TET_EDGES].reshape(-1, 2)
    all_edges = np.sort(all_edges, axis=1)
    unique_edges, idx_map = np.unique(all_edges, axis=0, return_inverse=True)
    cross = occ[unique_edges].sum(-1) == 1
    mapping = np.full(unique_edges.shape[0], -1, np.int64)
    mapping[cross] = np.arange(cross.sum())
    idx_map = mapping[idx_map].reshape(-1, 6)
    edge_ids = unique_edges[cross]

    tetindex = (occ4[ok] * (1 << np.arange(4))).sum(-1)
    ntri = NUM_TRIANGLES[tetindex]
    f1 = np.take_along_axis(idx_map[ntri == 1],
                            TRIANGLE_TABLE[tetindex[ntri == 1]][:, :3], 1)
    f2 = np.take_along_axis(idx_map[ntri == 2],
                            TRIANGLE_TABLE[tetindex[ntri == 2]][:, :6], 1)
    faces = np.concatenate([f1.reshape(-1, 3), f2.reshape(-1, 3)], axis=0)

    edge_verts = vertices[edge_ids.reshape(-1)].reshape(-1, 2, 3)
    edge_sdf = sdf[edge_ids.reshape(-1)].reshape(-1, 2)
    edge_scales = scales[edge_ids.reshape(-1)].reshape(-1, 2)
    return edge_verts, edge_sdf, edge_scales, faces, edge_ids
