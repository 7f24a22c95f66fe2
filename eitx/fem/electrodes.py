"""Boundary extraction and electrode placement on unstructured 2-D meshes.

Equivalent of pyeit's place_electrodes_equal_spacing as used by the
reference (model_generator.py:156-172): n electrodes equally spaced along
the mesh boundary perimeter, the first at the boundary node whose angle from
the mesh centroid is closest to ``starting_angle`` (180 degrees in the live
pipeline), walking the boundary loop in counter-clockwise orientation.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.errors import MeshingError


def boundary_loop(tris: np.ndarray) -> np.ndarray:
    """Ordered closed loop of boundary node indices.

    Boundary edges are triangle edges referenced by exactly one element.
    Raises MeshingError if the boundary is not a single closed loop.
    """
    tris = np.asarray(tris)
    edges = np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
    )
    key = np.sort(edges, axis=1)
    _, inv, counts = np.unique(
        key, axis=0, return_inverse=True, return_counts=True
    )
    boundary = edges[counts[inv] == 1]
    if boundary.shape[0] == 0:
        raise MeshingError("mesh has no boundary edges")
    # Undirected adjacency walk: every boundary node of a manifold loop has
    # exactly two boundary neighbours (element winding may be inconsistent,
    # so directed edges cannot be trusted).
    adj: dict = {}
    for a, b in boundary:
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    for node, nbrs in adj.items():
        if len(nbrs) != 2:
            raise MeshingError(
                f"non-manifold boundary at node {node} ({len(nbrs)} neighbours)"
            )
    start = int(boundary[0, 0])
    loop = [start]
    prev, cur = None, start
    while True:
        a, b = adj[cur]
        nxt = b if a == prev else a
        if nxt == start:
            break
        loop.append(nxt)
        prev, cur = cur, nxt
        if len(loop) > len(adj):
            raise MeshingError("boundary walk did not close (non-manifold mesh)")
    if len(loop) != len(adj):
        raise MeshingError(
            f"multiple boundary loops ({len(loop)} of {len(adj)} nodes walked)"
        )
    return np.array(loop, dtype=np.int64)


def _orient_ccw(nodes: np.ndarray, loop: np.ndarray) -> np.ndarray:
    pts = nodes[loop]
    x, y = pts[:, 0], pts[:, 1]
    signed2 = float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return loop if signed2 > 0 else loop[::-1].copy()


def place_electrodes_equal_spacing(
    nodes: np.ndarray,
    tris: np.ndarray,
    n_electrodes: int = 16,
    starting_angle: float = math.pi,
    starting_offset: float = 0.0,
) -> np.ndarray:
    """Electrode node indices, equally spaced by arc length along the
    boundary, starting at the node closest to ``starting_angle`` (radians,
    measured from the centroid) plus ``starting_offset`` (fraction of the
    inter-electrode spacing)."""
    nodes = np.asarray(nodes, dtype=np.float64)
    loop = _orient_ccw(nodes, boundary_loop(tris))
    pts = nodes[loop]
    centroid = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    dang = np.abs(np.angle(np.exp(1j * (ang - starting_angle))))
    start_i = int(np.argmin(dang))
    loop = np.roll(loop, -start_i)
    pts = nodes[loop]

    seg = np.linalg.norm(np.diff(np.vstack([pts, pts[:1]]), axis=0), axis=1)
    arclen = np.concatenate([[0.0], np.cumsum(seg)])[:-1]
    perim = float(seg.sum())
    spacing = perim / n_electrodes
    targets = (np.arange(n_electrodes) + starting_offset) * spacing
    el_nodes = []
    for t in targets:
        i = int(np.argmin(np.abs(arclen - (t % perim))))
        el_nodes.append(int(loop[i]))
    if len(set(el_nodes)) != n_electrodes:
        raise MeshingError(
            "electrode placement collided (boundary too coarse for "
            f"{n_electrodes} electrodes; refine lc)"
        )
    return np.array(el_nodes, dtype=np.int32)


def electrode_coordinates(nodes: np.ndarray, el_pos: np.ndarray) -> np.ndarray:
    return np.asarray(nodes)[np.asarray(el_pos)]
