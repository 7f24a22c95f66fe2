"""Small unstructured meshes for solver tests (no dependency on eitx.mesh).

Uses scipy's Delaunay (independent of the framework's own mesher) so FEM
tests validate the solver, not the mesher.
"""

import numpy as np
from scipy.spatial import Delaunay


def disk_mesh(n_boundary: int = 48, n_rings: int = 6, radius: float = 1.0):
    """Delaunay-triangulated disk. Returns (nodes (N,2), tris (M,3)) CCW."""
    pts = [(0.0, 0.0)]
    for r in range(1, n_rings + 1):
        rr = radius * r / n_rings
        k = max(6, int(round(n_boundary * r / n_rings)))
        for i in range(k):
            a = 2 * np.pi * i / k + (0.1 * r)  # slight twist avoids slivers
            pts.append((rr * np.cos(a), rr * np.sin(a)))
    nodes = np.array(pts)
    tris = Delaunay(nodes).simplices.astype(np.int64)
    # Drop degenerate triangles and fix winding to CCW.
    p = nodes[tris]
    cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 2, 0] - p[:, 0, 0]
    ) * (p[:, 1, 1] - p[:, 0, 1])
    tris = tris[np.abs(cross) > 1e-12]
    p = nodes[tris]
    cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 2, 0] - p[:, 0, 0]
    ) * (p[:, 1, 1] - p[:, 0, 1])
    flip = cross < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    return nodes, tris


def disk_mesh_with_classes(n_boundary: int = 48, n_rings: int = 6):
    """Disk mesh with a fake tissue layout: two 'lung' blobs, a 'bone'
    blob, 'fat' ring near the boundary, 'muscles' elsewhere."""
    nodes, tris = disk_mesh(n_boundary, n_rings)
    cent = nodes[tris].mean(axis=1)
    r = np.linalg.norm(cent, axis=1)
    cls = np.full(tris.shape[0], 1, dtype=np.int64)  # muscles
    cls[r > 0.85] = 3  # fat ring
    lungL = np.linalg.norm(cent - np.array([-0.4, 0.1]), axis=1) < 0.28
    lungR = np.linalg.norm(cent - np.array([0.4, 0.1]), axis=1) < 0.28
    cls[lungL | lungR] = 2  # lung
    bone = np.linalg.norm(cent - np.array([0.0, -0.55]), axis=1) < 0.15
    cls[bone] = 0  # bone
    return nodes, tris, cls
