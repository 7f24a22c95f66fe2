"""External contour extraction from binary masks.

Replaces cv2.findContours(RETR_EXTERNAL) (used ~15x in the reference, e.g.
utils.py:572,1173,1246). Connected components come from scipy.ndimage (C
native); each component's outer boundary is traced with Moore-neighbour
tracing (Jacob's stopping criterion), yielding 8-connected boundary pixels
in (x, y) order like OpenCV's CHAIN_APPROX_NONE.
"""

from __future__ import annotations

from typing import List

import numpy as np
from scipy import ndimage

# Moore neighbourhood in clockwise order starting from W (dx, dy).
_MOORE = np.array(
    [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)],
    dtype=np.int64,
)


def _trace_boundary(mask: np.ndarray, start_yx) -> np.ndarray:
    """Moore-neighbour boundary trace of the component containing start
    (start must be its topmost-then-leftmost pixel). Returns (N, 2) [x, y].

    Termination: the walk state (pixel, backtrack direction) after a move
    repeats the state after the very first move — robust for 1-pixel-wide
    appendages where the start pixel is revisited mid-trace.
    """
    h, w = mask.shape
    sy, sx = start_yx
    start = (int(sx), int(sy))
    boundary = [start]
    b = 0  # backtrack direction index (virtually entered start from the W)
    cur = start
    state0 = None
    while True:
        found = None
        for k in range(1, 9):  # scan clockwise starting after the backtrack
            d = (b + k) % 8
            nx = cur[0] + int(_MOORE[d][0])
            ny = cur[1] + int(_MOORE[d][1])
            if 0 <= nx < w and 0 <= ny < h and mask[ny, nx]:
                found = (d, (nx, ny))
                break
        if found is None:
            break  # isolated pixel
        d, nxt = found
        nb = (d + 4) % 8
        if state0 is None:
            state0 = (nxt, nb)
        elif (nxt, nb) == state0:
            break  # loop closed: same pixel entered the same way
        cur, b = nxt, nb
        boundary.append(cur)
        if len(boundary) > 4 * (h * w):
            raise RuntimeError("contour trace runaway")
    if len(boundary) > 1 and boundary[-1] == boundary[0]:
        boundary.pop()
    return np.array(boundary, dtype=np.int64)


def find_external_contours(
    mask: np.ndarray, min_pixels: int = 1
) -> List[np.ndarray]:
    """Outer boundary of every 8-connected component of ``mask`` > 0.

    Returns a list of (N, 2) integer [x, y] contours ordered by component
    label (top-to-bottom discovery order, like OpenCV). Components smaller
    than ``min_pixels`` are skipped.
    """
    m = np.asarray(mask) > 0
    structure = np.ones((3, 3), dtype=np.int64)
    labels, n = ndimage.label(m, structure=structure)
    contours = []
    if n == 0:
        return contours
    slices = ndimage.find_objects(labels)
    for i, sl in enumerate(slices, start=1):
        if sl is None:
            continue
        comp = labels[sl] == i
        if comp.sum() < min_pixels:
            continue
        ys, xs = np.nonzero(comp)
        k = np.lexsort((xs, ys))[0]  # topmost, then leftmost
        start = (ys[k], xs[k])
        local = _trace_boundary(comp, start)
        local[:, 0] += sl[1].start
        local[:, 1] += sl[0].start
        contours.append(local)
    return contours


def arc_length(contour: np.ndarray, closed: bool = True) -> float:
    c = np.asarray(contour, dtype=np.float64)
    if c.shape[0] < 2:
        return 0.0
    seg = np.linalg.norm(np.diff(c, axis=0), axis=1).sum()
    if closed:
        seg += float(np.linalg.norm(c[0] - c[-1]))
    return float(seg)
