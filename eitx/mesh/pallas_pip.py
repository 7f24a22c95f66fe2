"""Pallas TPU kernel: batched even-odd point-in-polygon test.

The triangle classifier's containment tensor is (Q points, C contours,
P edges); the jnp formulation (classify.py:_points_in_polys) materializes
the full (Q, C, P) crossing tensor in HBM before reducing. This kernel
streams the edge axis through VMEM, accumulating per-contour crossing
parities for a tile of points at a time — O(Q*C) memory instead of
O(Q*C*P).

Point layout: coordinates arrive as (2, Q) so the long axis sits on the
lane dimension; Q pads to a multiple of the 128-lane tile. Output is an
int8 (Q, C) containment matrix.

Used as the classifier's fast path on TPU; the jnp path remains the
fallback (and the numerical reference in tests, which run this kernel in
interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas import can fail on exotic backends; fall back silently
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_TILE_Q = 1024  # points per grid step (8 sublanes x 128 lanes)


def _pip_kernel(pts_ref, x1_ref, y1_ref, x2_ref, y2_ref, out_ref):
    """One grid step: TILE_Q points vs all C contours.

    pts_ref: (2, TILE_Q) point coords
    x1/y1/x2/y2: (C, P) edge endpoints
    out_ref: (C, TILE_Q) int8 containment (row store: Mosaic allows
    dynamic indices on the sublane axis, not the 128-lane axis)
    """
    x = pts_ref[0, :]  # (TILE_Q,)
    y = pts_ref[1, :]
    C = x1_ref.shape[0]

    # C is static: unroll so every store index is compile-time constant
    # (Mosaic requires tile-aligned dynamic sublane indices for int8).
    for c in range(C):
        x1 = x1_ref[c, :]  # (P,)
        y1 = y1_ref[c, :]
        x2 = x2_ref[c, :]
        y2 = y2_ref[c, :]
        # (P, TILE_Q) crossing test for this contour only
        yq = y[None, :]
        xq = x[None, :]
        dy = jnp.where(y2 - y1 == 0, 1e-30, y2 - y1)[:, None]
        crosses = ((y1[:, None] > yq) != (y2[:, None] > yq)) & (
            xq < (x2 - x1)[:, None] * (yq - y1[:, None]) / dy + x1[:, None]
        )
        parity = (crosses.astype(jnp.int32).sum(axis=0) % 2).astype(jnp.int8)
        out_ref[c, :] = parity


@functools.partial(jax.jit, static_argnames=("interpret",))
def points_in_polys_pallas(
    points: jnp.ndarray, polys: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(Q, 2) points x (C, P, 2) closed polygons -> (Q, C) bool."""
    q = points.shape[0]
    c, p, _ = polys.shape
    q_pad = ((q + _TILE_Q - 1) // _TILE_Q) * _TILE_Q
    pts = jnp.full((2, q_pad), -1e9, points.dtype)
    pts = pts.at[:, :q].set(points.T)
    x1 = polys[:, :, 0]
    y1 = polys[:, :, 1]
    x2 = jnp.roll(x1, -1, axis=1)
    y2 = jnp.roll(y1, -1, axis=1)

    grid = (q_pad // _TILE_Q,)
    out = pl.pallas_call(
        _pip_kernel,
        out_shape=jax.ShapeDtypeStruct((c, q_pad), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, _TILE_Q), lambda i: (0, i)),
            pl.BlockSpec((c, p), lambda i: (0, 0)),
            pl.BlockSpec((c, p), lambda i: (0, 0)),
            pl.BlockSpec((c, p), lambda i: (0, 0)),
            pl.BlockSpec((c, p), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, _TILE_Q), lambda i: (0, i)),
        interpret=interpret,
    )(pts, x1, y1, x2, y2)
    return out[:, :q].T.astype(bool)


def pallas_available() -> bool:
    return _PALLAS_OK
