"""Device-side triangle -> tissue classification.

The reference classifies every mesh element with Shapely polygon
intersections inside a multiprocessing pool — one Python task per triangle
(femm_generator.py:75-76,118-184), the #2 hot loop of the pipeline. Here the
whole classification is one vectorized XLA program:

  - contours are padded to a (C, P, 2) tensor (repeating the last vertex —
    zero-length edges contribute nothing to a crossing test),
  - each triangle is sampled at its centroid plus a fixed barycentric
    pattern (S points),
  - an (T, S, C) even-odd containment tensor is computed in one shot on the
    VPU, giving per-contour coverage fractions,

and the reference's decision rule is applied branch-free:
  1. smallest-area contour containing the centroid, else
  2. smallest-area contour covering > 0.5 of the triangle, else
  3. contour with the largest (non-zero) coverage, else
  4. the outer-contour class.
Contours whose class equals the outer class are excluded (reference :169).
skin_width == -1 marks triangles touching the outer boundary as class 4
(reference :153-160).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _barycentric_samples(n: int) -> np.ndarray:
    """Fixed low-discrepancy barycentric sample pattern, centroid first."""
    base = [
        (1 / 3, 1 / 3, 1 / 3),
        (0.6, 0.2, 0.2),
        (0.2, 0.6, 0.2),
        (0.2, 0.2, 0.6),
        (0.5, 0.4, 0.1),
        (0.1, 0.5, 0.4),
        (0.4, 0.1, 0.5),
        (0.45, 0.45, 0.1),
        (0.1, 0.45, 0.45),
        (0.45, 0.1, 0.45),
        (0.8, 0.1, 0.1),
        (0.1, 0.8, 0.1),
        (0.1, 0.1, 0.8),
    ]
    reps = -(-n // len(base))
    return np.array((base * reps)[:n], dtype=np.float64)


def pad_contours(
    contours: Sequence[Tuple[int, np.ndarray]]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(class_ids (C,), polys (C, P, 2), areas (C,)) padded by repeating the
    final vertex; classes sorted by area ascending (reference sorts
    contours by area so smaller regions win ties, femm_generator.py:60)."""
    from ..geometry.polygon import polygon_area

    if not contours:
        return (
            np.zeros((0,), np.int32),
            np.zeros((0, 4, 2), np.float64),
            np.zeros((0,), np.float64),
        )
    areas = np.array([polygon_area(p) for _, p in contours])
    order = np.argsort(areas, kind="stable")
    max_p = max(p.shape[0] for _, p in contours)
    C = len(contours)
    polys = np.zeros((C, max_p, 2), dtype=np.float64)
    cids = np.zeros((C,), dtype=np.int32)
    for k, idx in enumerate(order):
        cid, p = contours[idx]
        polys[k, : p.shape[0]] = p
        polys[k, p.shape[0] :] = p[-1]
        cids[k] = cid
    return cids, polys, areas[order]


@functools.partial(jax.jit, static_argnames=())
def _points_in_polys(points: jnp.ndarray, polys: jnp.ndarray) -> jnp.ndarray:
    """(Q, 2) points x (C, P, 2) polys -> (Q, C) even-odd containment."""
    x = points[:, None, None, 0]
    y = points[:, None, None, 1]
    x1 = polys[None, :, :, 0]
    y1 = polys[None, :, :, 1]
    x2 = jnp.roll(polys[:, :, 0], -1, axis=1)[None]
    y2 = jnp.roll(polys[:, :, 1], -1, axis=1)[None]
    dy = jnp.where(y2 - y1 == 0, 1e-30, y2 - y1)
    crosses = ((y1 > y) != (y2 > y)) & (x < (x2 - x1) * (y - y1) / dy + x1)
    return crosses.sum(axis=2) % 2 == 1


def _min_dist_to_ring(points: jnp.ndarray, ring: jnp.ndarray) -> jnp.ndarray:
    """(Q, 2) points -> min distance to the ring's segments."""
    a = ring
    b = jnp.roll(ring, -1, axis=0)
    v = b - a
    L2 = jnp.maximum((v**2).sum(-1), 1e-30)
    w = points[:, None, :] - a[None]
    t = jnp.clip((w * v[None]).sum(-1) / L2[None], 0.0, 1.0)
    proj = a[None] + t[..., None] * v[None]
    return jnp.sqrt(((points[:, None, :] - proj) ** 2).sum(-1)).min(axis=1)


import os

# Pallas PIP kernel is the DEFAULT fast path on TPU (opt out with
# EITX_PALLAS=0); it is bit-exact vs the jnp path (tests/test_pallas_pip.py)
# and avoids materializing the (Q, C, P) crossing tensor in HBM.
_USE_PALLAS = os.environ.get("EITX_PALLAS", "1") != "0"


@functools.partial(jax.jit, static_argnames=("outer_class",))
def _classify_kernel(verts, bary, polys, cids, outer_class):
    """One fused program: sample -> containment -> decision rule.

    verts (M, 3, 2), bary (S, 3), polys (C, P, 2), cids (C,) int32.
    Returns (M,) int32 class ids.
    """
    M = verts.shape[0]
    samples = jnp.einsum("sk,mkd->msd", bary, verts)  # (M, S, 2)
    S = samples.shape[1]
    if _USE_PALLAS and jax.default_backend() == "tpu":
        # compiled-mode pallas is TPU-only; CPU falls through to jnp
        from .pallas_pip import points_in_polys_pallas

        inside = points_in_polys_pallas(samples.reshape(-1, 2), polys)
    else:
        inside = _points_in_polys(samples.reshape(-1, 2), polys)
    inside = inside.reshape(M, S, -1)  # (M, S, C)
    frac = inside.mean(axis=1)
    centroid_in = inside[:, 0, :]  # first sample is the centroid

    C = frac.shape[1]
    idxs = jnp.arange(C)
    big = C + 1
    # rule 1: smallest-area contour containing the centroid
    first_cent = jnp.min(jnp.where(centroid_in, idxs, big), axis=1)
    # rule 2: smallest-area contour covering > 0.5
    first_half = jnp.min(jnp.where(frac > 0.5, idxs, big), axis=1)
    # rule 3: max coverage (if any)
    best_frac = jnp.argmax(frac, axis=1)
    has_any = frac.max(axis=1) > 0
    choice = jnp.where(
        first_cent < big,
        first_cent,
        jnp.where(first_half < big, first_half, jnp.where(has_any, best_frac, big)),
    )
    return jnp.where(
        choice < big,
        cids[jnp.clip(choice, 0, C - 1)],
        jnp.int32(outer_class),
    )


@jax.jit
def _boundary_touch_kernel(verts, ring, eps):
    """(M, 3, 2) vertices -> (M,) bool: any vertex within eps of the ring."""
    M = verts.shape[0]
    d = _min_dist_to_ring(verts.reshape(-1, 2), ring).reshape(M, 3)
    return (d < eps).any(axis=1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_up_pow2(x: int, base: int) -> int:
    """Smallest base * 2^k >= x — GEOMETRIC shape buckets.

    Linear buckets (multiples of base) gave nearly every real subject a
    distinct (C_pad, P_pad) pair, and on remote-compile TPU attachments
    each distinct shape costs ~18 s to compile (~2 s to reload from the
    persistent cache) — measured as 2-21 s per classify call, the
    dominant cost of the whole image->dat pipeline tail. Power-of-two
    buckets collapse the shape family to log-many programs; after 2-3
    subjects everything is warm (measured ~30 ms)."""
    out = base
    while out < x:
        out *= 2
    return out


def classify_triangles(
    nodes: np.ndarray,
    tris: np.ndarray,
    contours: List[Tuple[int, np.ndarray]],
    outer_class: int,
    outer_poly: np.ndarray,
    skin_width: float = 1.0,
    n_samples: int = 8,
    boundary_eps: float = 1e-6,
    bucket_tris: int = 2048,
    bucket_contours: int = 4,
    bucket_points: int = 64,
) -> np.ndarray:
    """Per-element class ids (M,) int32.

    Static-shape bucketing: triangle count, contour count and contour
    point count are padded up to bucket multiples so one compiled kernel
    serves every subject (fresh XLA shapes are expensive to compile on
    remote-compile TPU setups). Padding triangles are discarded; padding
    contours are degenerate and placed far outside the scene.
    """
    nodes_np = np.asarray(nodes, dtype=np.float64)
    tris_np = np.asarray(tris)
    M = int(tris_np.shape[0])
    M_pad = _round_up(max(M, 1), bucket_tris)
    if M_pad > M:
        tris_np = np.vstack([tris_np, np.tile(tris_np[:1], (M_pad - M, 1))])
    nodes_j = jnp.asarray(nodes_np, jnp.float32)
    verts = nodes_j[jnp.asarray(tris_np, jnp.int32)]  # (M_pad, 3, 2)

    inner = [(cid, p) for cid, p in contours if int(cid) != int(outer_class)]
    if not inner:
        cls = np.full((M,), outer_class, dtype=np.int32)
    else:
        cids, polys, _ = pad_contours(inner)
        C, P = polys.shape[0], polys.shape[1]
        C_pad = _round_up_pow2(C, bucket_contours)
        P_pad = _round_up_pow2(P, bucket_points)
        if P_pad > P:
            polys = np.concatenate(
                [polys, np.repeat(polys[:, -1:], P_pad - P, axis=1)], axis=1
            )
        if C_pad > C:
            far = np.full((C_pad - C, P_pad, 2), -1e7)
            polys = np.concatenate([polys, far], axis=0)
            cids = np.concatenate(
                [cids, np.full((C_pad - C,), outer_class, np.int32)]
            )
        bary = jnp.asarray(_barycentric_samples(n_samples), jnp.float32)
        cls_j = _classify_kernel(
            verts,
            bary,
            jnp.asarray(polys, jnp.float32),
            jnp.asarray(cids, jnp.int32),
            int(outer_class),
        )
        cls = np.asarray(cls_j, dtype=np.int32)[:M]

    if skin_width == -1 and outer_poly is not None and len(outer_poly) >= 3:
        ring = np.asarray(outer_poly, dtype=np.float64)
        R = ring.shape[0]
        R_pad = _round_up_pow2(R, bucket_points)
        if R_pad > R:
            ring = np.vstack([ring, np.tile(ring[-1:], (R_pad - R, 1))])
        touching = np.asarray(
            _boundary_touch_kernel(
                verts,
                jnp.asarray(ring, jnp.float32),
                jnp.float32(max(boundary_eps, 1e-3)),
            )
        )[:M]
        cls = np.where(touching, np.int32(4), cls)
    return cls
