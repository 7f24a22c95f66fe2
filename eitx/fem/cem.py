"""Complete electrode model (CEM) forward solver.

Physics upgrade over both reference solver families: pyeit injects point
currents at boundary nodes and FEMM approximates flat conductors; the CEM
models finite-width electrodes with contact impedance z — the accepted
forward model for real EIT hardware (Somersalo, Cheney & Isaacson 1992).

Augmented symmetric system over (node potentials u, electrode potentials
U):

    [ K + B   W ] [u]   [0]
    [ W^T     D ] [U] = [I]

  B_ij = sum_e (1/z_e) int_{Gamma_e} phi_i phi_j ds   (edge mass matrices)
  W_ie = -(1/z_e)      int_{Gamma_e} phi_i ds
  D_ee = |Gamma_e| / z_e
  I_e  = injected current per electrode (sum zero)

The tissue part K keeps its per-class linearity, and B/W/D are
conductivity-independent, so breathing monitoring remains a one-parameter
matrix pencil — the same batched Cholesky and spectral machinery runs on
the augmented matrices (electrode rows ride along as extra "nodes").
Grounding: one electrode potential is constrained via a large-but-finite
penalty-free row substitution (last electrode).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .assembly import ClassStiffness
from .electrodes import _orient_ccw, boundary_loop
from .solver import _measure


@dataclass
class CEMSystem:
    """Augmented per-class stiffness for the CEM.

    k_class: (C, N+E, N+E) tissue matrices (zero in electrode rows)
    fixed:   (N+E, N+E) conductivity-independent part (B, W, D, grounding)
    n_nodes: N (real FEM nodes); n_el: E
    """

    k_class: jnp.ndarray
    fixed: jnp.ndarray
    n_nodes: int
    n_el: int

    @property
    def dim(self) -> int:
        return self.n_nodes + self.n_el


def electrode_arcs(
    nodes: np.ndarray,
    tris: np.ndarray,
    n_electrodes: int = 16,
    coverage: float = 0.5,
    starting_angle: float = np.pi,
):
    """Boundary edges covered by each electrode.

    Electrodes are arcs of length coverage * spacing, centred at equal
    arc-length intervals starting near ``starting_angle``. Returns a list
    of (edge node pairs (k, 2) int, edge lengths (k,)) per electrode.
    """
    nodes = np.asarray(nodes, dtype=np.float64)
    loop = _orient_ccw(nodes, boundary_loop(tris, nodes))
    pts = nodes[loop]
    centroid = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    start_i = int(np.argmin(np.abs(np.angle(np.exp(1j * (ang - starting_angle))))))
    loop = np.roll(loop, -start_i)
    pts = nodes[loop]
    m = len(loop)
    seg_len = np.linalg.norm(pts[(np.arange(m) + 1) % m] - pts, axis=1)
    # arc-length position of each edge midpoint
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    perim = cum[-1]
    mid = (cum[:-1] + cum[1:]) / 2.0
    spacing = perim / n_electrodes
    half_w = 0.5 * coverage * spacing
    arcs = []
    for e in range(n_electrodes):
        center = e * spacing
        d = np.abs((mid - center + perim / 2) % perim - perim / 2)
        sel = np.where(d <= half_w)[0]
        if sel.size == 0:
            sel = np.array([int(np.argmin(d))])
        pairs = np.stack([loop[sel], loop[(sel + 1) % m]], axis=1)
        arcs.append((pairs, seg_len[sel]))
    return arcs


def build_cem_system(
    cs: ClassStiffness,
    nodes: np.ndarray,
    tris: np.ndarray,
    n_electrodes: int = 16,
    z_contact: float = 1e-2,
    coverage: float = 0.5,
    starting_angle: float = np.pi,
    dtype=jnp.float32,
) -> CEMSystem:
    """Augment per-class stiffness with CEM boundary blocks.

    ``cs`` must be built WITHOUT node padding (pad_nodes_to=1) and WITHOUT
    the interior reference-node grounding (ground_ref=False) — the CEM
    fixes the gauge through the last electrode's potential instead, and
    pinning an interior node too would over-constrain the system.
    """
    n = int(cs.n_real_nodes)
    if cs.n_nodes != n:
        raise ValueError("build ClassStiffness with pad_nodes_to=1 for CEM")
    E = n_electrodes
    dim = n + E
    arcs = electrode_arcs(nodes, tris, E, coverage, starting_angle)

    fixed = np.zeros((dim, dim), dtype=np.float64)
    for e, (pairs, lens) in enumerate(arcs):
        inv_z = 1.0 / z_contact
        for (a, b), L in zip(pairs, lens):
            # edge mass L/6 [[2,1],[1,2]]
            fixed[a, a] += inv_z * L / 3.0
            fixed[b, b] += inv_z * L / 3.0
            fixed[a, b] += inv_z * L / 6.0
            fixed[b, a] += inv_z * L / 6.0
            # coupling -1/z int phi ds = -L/(2z)
            fixed[a, n + e] -= inv_z * L / 2.0
            fixed[n + e, a] -= inv_z * L / 2.0
            fixed[b, n + e] -= inv_z * L / 2.0
            fixed[n + e, b] -= inv_z * L / 2.0
        fixed[n + e, n + e] += inv_z * float(lens.sum())

    # ground the joint constant nullspace through the LAST electrode's
    # potential (U_{E-1} = 0): the resulting matrix is SPD.
    gnd = dim - 1
    fixed[gnd, :] = 0.0
    fixed[:, gnd] = 0.0
    fixed[gnd, gnd] = 1.0

    k_class = np.zeros(
        (cs.k_class.shape[0], dim, dim), dtype=np.float64
    )
    k_class[:, :n, :n] = np.asarray(cs.k_class, np.float64)

    return CEMSystem(
        k_class=jnp.asarray(k_class, dtype),
        fixed=jnp.asarray(fixed, dtype),
        n_nodes=n,
        n_el=E,
    )


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def _cem_solve(k_class, fixed, sigma, currents, meas_mat, n_nodes):
    with jax.default_matmul_precision("highest"):
        K = (
            jnp.tensordot(
                sigma, k_class, axes=([1], [0]),
                precision=jax.lax.Precision.HIGHEST,
            )
            + fixed[None]
        )  # (T, dim, dim)
        dim = k_class.shape[-1]
        E = dim - n_nodes
        B = jnp.zeros((dim, currents.shape[0]), k_class.dtype)
        B = B.at[n_nodes:, :].set(currents.T)
        B = B.at[dim - 1, :].set(0.0)  # grounded electrode row

        def solve_one(Kt):
            c, lower = jax.scipy.linalg.cho_factor(Kt)
            U = jax.scipy.linalg.cho_solve((c, lower), B)
            R = B - Kt @ U
            U = U + jax.scipy.linalg.cho_solve((c, lower), R)
            u_el = U[n_nodes:, :]  # (E, n_exc) electrode potentials
            return _measure(u_el, meas_mat)

        return jax.vmap(solve_one)(K)


def forward_solve_cem(
    system: CEMSystem,
    sigma: np.ndarray,
    ex_mat: np.ndarray,
    meas_mat: np.ndarray,
    current: float = 1.0,
) -> jnp.ndarray:
    """Batched CEM forward solve.

    sigma (T, C) per-class conductivities; ex_mat rows [a, b] drive
    +current into electrode a and -current out of b. Returns
    (T, n_exc, n_meas) electrode-voltage differences.
    """
    E = system.n_el
    ex = np.asarray(ex_mat)
    currents = np.zeros((ex.shape[0], E), dtype=np.float64)
    for i, (a, b) in enumerate(ex):
        currents[i, a] = current
        currents[i, b] = -current
    return _cem_solve(
        system.k_class,
        system.fixed,
        jnp.asarray(sigma, system.k_class.dtype),
        jnp.asarray(currents, system.k_class.dtype),
        jnp.asarray(meas_mat),
        system.n_nodes,
    )


def spectral_cem_solver(
    system: CEMSystem,
    sigma_base: np.ndarray,
    lung_class: int,
    ex_mat: np.ndarray,
    meas_mat: np.ndarray,
    alpha0: float,
    current: float = 1.0,
    rank_bucket: int = 256,
):
    """Spectral pencil factorization of the CEM system. The lung block
    keeps its small node support inside the augmented matrix, so the
    low-rank (lung-subspace) Woodbury setup applies unchanged — one
    Cholesky of the augmented system plus two rank-bucket eighs instead
    of an O(D^3) full-pencil eigh."""
    from .spectral import LowRankSpectralSolver

    dim = system.dim
    n = system.n_nodes
    ex = np.asarray(ex_mat)
    rhs = np.zeros((dim, ex.shape[0]), dtype=np.float64)
    for i, (a, b) in enumerate(ex):
        rhs[n + a, i] = current
        rhs[n + b, i] = -current
    rhs[dim - 1, :] = 0.0  # grounded electrode row
    readout = np.arange(n, dim, dtype=np.int32)
    return LowRankSpectralSolver.build_general(
        system.k_class,
        system.fixed,
        sigma_base,
        lung_class,
        jnp.asarray(rhs, system.k_class.dtype),
        readout,
        meas_mat,
        alpha0,
        rank_bucket=rank_bucket,
    )
