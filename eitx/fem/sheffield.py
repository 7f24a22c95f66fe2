"""Sheffield-protocol FEMM-path measurement: electrode line integrals.

The reference's legacy solver measures each electrode voltage as a contour
LINE INTEGRAL of the potential along the flat electrode segment
(femm.co_lineintegral(3) = average voltage over contour,
synthetic_datasets_generator.py:125-142), then takes neighbour differences
with per-projection wraparound (abs_to_diff, :144-162). Current drive per
projection idx is GND at electrode idx and INJ at (idx+1) % N
(calculate_EIT_projection_femm, :164-184).

Here the line integral becomes a precomputed averaging matrix W
(n_elec, n_nodes): each row holds arc-length-weighted P1 interpolation
weights for sample points along the electrode footprint, so measuring all
electrodes for all projections is one matmul on the MXU. The same weights
distribute the injected current along the electrode (uniform current
density — the flat-electrode approximation FEMM's conductor constraint
converges to for thin electrodes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import assemble_stiffness
from .admittance import EPS0
from .protocol import abs_to_diff

__all__ = [
    "abs_to_diff",
    "electrode_averaging_matrix",
    "sheffield_ex_mat",
    "sheffield_solve_admittance",
    "sheffield_monitoring",
]


def _point_in_tri_weights(p: np.ndarray, tri_xy: np.ndarray):
    """Barycentric weights of point p in triangle tri_xy (3, 2)."""
    a, b, c = tri_xy
    det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
    if abs(det) < 1e-30:
        return None
    l1 = ((b[0] - p[0]) * (c[1] - p[1]) - (c[0] - p[0]) * (b[1] - p[1])) / det
    l2 = ((c[0] - p[0]) * (a[1] - p[1]) - (a[0] - p[0]) * (c[1] - p[1])) / det
    l3 = 1.0 - l1 - l2
    return np.array([l1, l2, l3])


def electrode_averaging_matrix(
    nodes: np.ndarray,
    tris: np.ndarray,
    elecs: np.ndarray,
    samples: int = 9,
    tol: float = 1e-6,
) -> np.ndarray:
    """(n_elec, n_nodes) arc-average interpolation weights.

    For each electrode, ``samples`` points along the segment between its
    two edge points (elecs[i, 0] and elecs[i, 1]) are located in the mesh
    and their P1 shape-function weights are averaged (trapezoid rule along
    the arc = uniform weights for a straight segment). Rows sum to 1.

    Host-side precompute (runs once per mesh); the solve-time measurement
    is then W @ u.
    """
    nodes = np.asarray(nodes, np.float64)
    tris = np.asarray(tris, np.int64)
    n_elec = elecs.shape[0]
    W = np.zeros((n_elec, nodes.shape[0]))
    tri_xy = nodes[tris]  # (M, 3, 2)
    mins = tri_xy.min(axis=1)
    maxs = tri_xy.max(axis=1)
    for i in range(n_elec):
        p0, p1 = np.asarray(elecs[i, 0]), np.asarray(elecs[i, 1])
        ts = np.linspace(0.0, 1.0, samples)
        pts = p0[None] + ts[:, None] * (p1 - p0)[None]
        for p in pts:
            cand = np.where(
                (mins[:, 0] <= p[0] + tol) & (p[0] - tol <= maxs[:, 0])
                & (mins[:, 1] <= p[1] + tol) & (p[1] - tol <= maxs[:, 1])
            )[0]
            best_t, best_w, best_pen = -1, None, np.inf
            for t in cand:
                w = _point_in_tri_weights(p, tri_xy[t])
                if w is None:
                    continue
                pen = -min(w.min(), 0.0)  # how far outside the triangle
                if pen < best_pen:
                    best_pen, best_t, best_w = pen, t, w
                    if pen == 0.0:
                        break
            if best_t < 0:
                # point off the mesh hull: snap to the nearest node
                best_t = 0
                j = int(np.argmin(np.linalg.norm(nodes - p, axis=1)))
                W[i, j] += 1.0
                continue
            w = np.clip(best_w, 0.0, None)
            w = w / w.sum()
            W[i, tris[best_t]] += w
        W[i] /= W[i].sum()
    return W


def sheffield_ex_mat(n_elec: int) -> np.ndarray:
    """(n_proj, 2) [inj, gnd] pairs: projection idx drives (idx+1, idx)
    (calculate_EIT_projection_femm:164-184)."""
    idx = np.arange(n_elec)
    return np.stack([(idx + 1) % n_elec, idx], axis=1)


@functools.partial(jax.jit, static_argnames=("n_nodes", "ref_node"))
def sheffield_solve_admittance(
    nodes,
    tris,
    sigma_e,
    eps_r_e,
    freq_hz,
    W,
    current,
    n_nodes: int,
    ref_node: int = 0,
):
    """One frame of the FEMM path: all projections, line-integral measure.

    Args:
      W: (n_elec, n_nodes) electrode averaging matrix; also used
        (transposed, scaled by ``current``) to spread the injected current
        along the electrode footprint.
    Returns:
      (n_proj, n_elec) ABSOLUTE electrode voltages (real part), one row per
      projection — feed through abs_to_diff for the reference's dataset
      rows.
    """
    with jax.default_matmul_precision("highest"):
        omega = 2.0 * jnp.pi * freq_hz
        Kr = assemble_stiffness(nodes, tris, sigma_e, n_nodes)
        Ki = assemble_stiffness(nodes, tris, omega * EPS0 * eps_r_e, n_nodes)
        Kr = Kr.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
        Kr = Kr.at[ref_node, ref_node].set(1.0)
        Ki = Ki.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
        n_elec = W.shape[0]
        ex = jnp.asarray(sheffield_ex_mat(n_elec))
        # B[:, p] = I * (w_inj - w_gnd): uniform current density along the
        # electrode arc
        B = current * (W[ex[:, 0]] - W[ex[:, 1]]).T  # (N, n_proj)
        B = B.at[ref_node, :].set(0.0)
        n = n_nodes
        big = jnp.zeros((2 * n, 2 * n), Kr.dtype)
        big = big.at[:n, :n].set(Kr).at[:n, n:].set(-Ki)
        big = big.at[n:, :n].set(Ki).at[n:, n:].set(Kr)
        rhs = jnp.concatenate([B, jnp.zeros_like(B)], axis=0)
        U = jnp.linalg.solve(big, rhs)
        u_re = U[:n]  # (N, n_proj)
        return (W @ u_re).T  # (n_proj, n_elec)


def sheffield_monitoring(
    nodes: np.ndarray,
    tris: np.ndarray,
    sigma_frames: np.ndarray,
    eps_frames: np.ndarray,
    freq_hz: float,
    elecs: np.ndarray,
    current: float = 0.005,
    samples: int = 9,
) -> np.ndarray:
    """FEMM-path monitoring: T frames -> (T, n_proj, n_elec) voltage
    DIFFERENCES (abs_to_diff applied per projection row), the layout the
    reference's simulate_EIT_femm fills into V (:260-284) — computed as one
    vmapped XLA program instead of one FEMM COM process per projection.
    """
    nodes = np.asarray(nodes)
    tris = np.asarray(tris, np.int64)
    # drop orphan nodes: their all-zero stiffness rows would make the
    # system singular (the pyeit path does the same via compact_mesh_nodes)
    used = np.unique(tris)
    if used.size != nodes.shape[0]:
        remap = np.full(nodes.shape[0], -1, np.int64)
        remap[used] = np.arange(used.size)
        nodes = nodes[used]
        tris = remap[tris]
    n_nodes = nodes.shape[0]
    W = jnp.asarray(
        electrode_averaging_matrix(nodes, tris, elecs, samples=samples),
        jnp.float32,
    )
    nodes_j = jnp.asarray(nodes, jnp.float32)
    tris_j = jnp.asarray(tris, jnp.int32)

    def one(sig, eps):
        return sheffield_solve_admittance(
            nodes_j, tris_j, sig, eps, jnp.float32(freq_hz), W,
            jnp.float32(current), n_nodes,
        )

    v_abs = jax.vmap(one)(
        jnp.asarray(sigma_frames, jnp.float32),
        jnp.asarray(eps_frames, jnp.float32),
    )
    n_elec = elecs.shape[0]
    return abs_to_diff(np.asarray(v_abs), n_elec)
