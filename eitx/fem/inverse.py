"""Inverse EIT: difference-imaging reconstruction on the MXU.

Beyond the reference (which only generates forward datasets —
synthetic_datasets_generator.py): the standard linearized
difference-imaging solver the EIT community runs on such datasets
(pyeit's 'jac' solver / EIDORS one-step Gauss-Newton), built TPU-first:

  J[(i, mn), e] = -u_i|_e^T ke_e (u_m - u_n)|_e     (adjoint sensitivity)

with ke the unit-conductivity P1 element matrices, assembled for every
excitation x measurement pair as ONE einsum over elements. Reconstruction
solves in measurement space (n_meas_total x n_meas_total, ~208^2 for the
16-electrode adjacent protocol — tiny on the MXU):

  dsigma = J^T (J J^T + lambda * diag(J J^T))^{-1} dv

so reconstructing a whole breathing monitoring (T frames) is a single
batched matmul after one factorization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import assemble_stiffness, element_geometry


@dataclass
class DifferenceImager:
    """Precomputed Jacobian + regularized measurement-space factor."""

    jac: jnp.ndarray  # (n_meas_total, M)
    chol: jnp.ndarray  # cho_factor (upper) of (J J^T + lam diag)
    tris: np.ndarray
    nodes: np.ndarray

    def reconstruct(self, dv: jnp.ndarray) -> jnp.ndarray:
        """dv (..., n_meas_total) voltage differences -> (..., M) dsigma."""
        return _reconstruct(self.jac, self.chol, dv)

    @classmethod
    def build(
        cls,
        nodes: np.ndarray,
        tris: np.ndarray,
        sigma_ref: np.ndarray,
        el_pos,
        ex_mat,
        meas_mat,
        lam: float = 1e-3,
        ref_node: int = 0,
    ) -> "DifferenceImager":
        """Factor the linearized inverse around ``sigma_ref``.

        lam is the relative Tikhonov weight (scaled by the mean diagonal
        of J J^T, so it is dimensionless).
        """
        nodes_j = jnp.asarray(nodes, jnp.float32)
        tris_j = jnp.asarray(tris, jnp.int32)
        jac = _difference_jacobian(
            nodes_j, tris_j, jnp.asarray(sigma_ref, jnp.float32),
            jnp.asarray(el_pos), jnp.asarray(ex_mat), jnp.asarray(meas_mat),
            nodes.shape[0], ref_node,
        )
        c = _factor(jac, jnp.float32(lam))
        return cls(jac=jac, chol=c, tris=np.asarray(tris),
                   nodes=np.asarray(nodes))


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "ref_node")
)
def _difference_jacobian(
    nodes, tris, sigma_e, el_pos, ex_mat, meas_mat, n_nodes: int,
    ref_node: int = 0, n_real=None,
):
    """(n_exc * n_meas, M) sensitivity of measured differences to
    per-element conductivity, via the adjoint fields.

    ``n_real`` < n_nodes marks the tail [n_real:] as static-shape padding
    nodes (isolated rows get a unit diagonal so K stays SPD) — the same
    bucketing trick ClassStiffness uses, so one compiled program serves
    every mesh in a node bucket instead of paying a fresh remote XLA
    compile (~minutes) per subject shape. ``n_real`` is TRACED (a scalar
    array, not a static int): round 4 found the static version re-keyed
    a fresh program per subject (27 s remote compile each) even inside
    one node bucket, exactly the disease the bucket exists to cure.
    """
    with jax.default_matmul_precision("highest"):
        K = assemble_stiffness(nodes, tris, sigma_e, n_nodes)
        K = K.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
        K = K.at[ref_node, ref_node].set(1.0)
        if n_real is None:
            n_real = n_nodes
        pad = (jnp.arange(n_nodes) >= n_real).astype(K.dtype)
        pad = pad.at[ref_node].set(0.0)
        K = K + jnp.diag(pad)
        # fields for every electrode injected against electrode 0 gauge:
        # measurement adjoints are differences of single-electrode fields
        n_el = el_pos.shape[0]
        B_el = jnp.zeros((n_nodes, n_el), K.dtype)
        B_el = B_el.at[el_pos, jnp.arange(n_el)].add(1.0)
        B_el = B_el.at[ref_node, :].set(0.0)
        c, lower = jax.scipy.linalg.cho_factor(K)
        U_el = jax.scipy.linalg.cho_solve((c, lower), B_el)  # (N, n_el)
        # excitation fields: u_exc = U_el[:, a] - U_el[:, b]
        u_exc = U_el[:, ex_mat[:, 0]] - U_el[:, ex_mat[:, 1]]  # (N, n_exc)
        ke, _ = element_geometry(nodes, tris)  # (M, 3, 3) unit conductivity
        # per-element vertex potentials
        v_exc = u_exc[tris, :]  # (M, 3, n_exc)
        v_el = U_el[tris, :]  # (M, 3, n_el)
        # z[m, 3, n_el] = ke @ v_el : adjoint side per element
        z = jnp.einsum("mij,mje->mie", ke, v_el)
        # S[exc, el, m] = v_exc^T ke v_el per element
        S = jnp.einsum("mix,mie->xem", v_exc, z)  # (n_exc, n_el, M)
        # measurement differences: J = -(S[:, n] - S[:, m])
        n_idx = meas_mat[:, :, 0]  # (n_exc, n_meas)
        m_idx = meas_mat[:, :, 1]
        Sn = jnp.take_along_axis(S, n_idx[:, :, None], axis=1)
        Sm = jnp.take_along_axis(S, m_idx[:, :, None], axis=1)
        J = -(Sn - Sm)  # (n_exc, n_meas, M)
        return J.reshape(-1, S.shape[-1])


@jax.jit
def _factor(jac, lam):
    with jax.default_matmul_precision("highest"):
        G = jac @ jac.T
        reg = lam * jnp.mean(jnp.diag(G))
        G = G + reg * jnp.eye(G.shape[0], dtype=G.dtype)
        c, _ = jax.scipy.linalg.cho_factor(G)  # upper (lower=False)
        return c


@jax.jit
def _reconstruct(jac, c, dv):
    with jax.default_matmul_precision("highest"):
        flat = dv.reshape(-1, jac.shape[0])  # (..., n_meas_total)
        w = jax.scipy.linalg.cho_solve((c, False), flat.T)  # (n_meas, T)
        ds = (jac.T @ w).T  # (T, M)
        return ds.reshape(*dv.shape[:-1], jac.shape[1])


def monitoring_linearization(mesh_data, classes=None, cfg=None):
    """Shared prep for linear imaging of a pipeline mesh: returns
    (info, sigma_ref, el_pos, protocol) — the compacted mesh, the
    tissue-table reference conductivities, equally-spaced electrodes, and
    the measurement protocol, all from the same config defaults the
    forward simulation used."""
    import math

    from ..core.config import ClassMap, SimulationConfig
    from ..physio.materials import get_materials, tissue_conductivities
    from .electrodes import place_electrodes_equal_spacing
    from .forward import compact_mesh_nodes, prepare_mesh_info
    from .protocol import create_protocol

    classes = classes or ClassMap()
    cfg = cfg or SimulationConfig()
    info = compact_mesh_nodes(prepare_mesh_info(mesh_data, classes))
    mats = get_materials()
    base = tissue_conductivities(mats, cfg.frequency_hz, classes.id_to_name())
    sigma_ref = np.array(
        [base[classes.id_to_name()[int(c)]] for c in info.cond], np.float64
    )
    el = place_electrodes_equal_spacing(
        info.node, info.element, cfg.n_electrodes,
        starting_angle=math.radians(cfg.starting_angle_deg),
    )
    proto = create_protocol(
        cfg.n_electrodes, cfg.dist_exc, cfg.step_meas, cfg.parser_meas
    )
    return info, sigma_ref, el, proto


def reconstruct_monitoring(
    mesh_data,
    v_frames: np.ndarray,
    classes=None,
    cfg=None,
    lam: float = 1e-3,
    ref_frame: int = 0,
):
    """Reconstruct per-element conductivity CHANGES for a whole monitoring.

    Args:
      mesh_data: NODES/TRIANGLES/CLASS dict (the forward pipeline's mesh).
      v_frames: (T, n_exc * n_meas) voltage rows (e.g. a .dat file's
        unique frames).
      ref_frame: index of the reference (baseline) frame.
    Returns:
      (dsigma (T, M), imager) — images of the breathing-induced
      conductivity change per element.
    """
    info, sigma_ref, el, proto = monitoring_linearization(
        mesh_data, classes, cfg
    )
    imager = DifferenceImager.build(
        info.node, info.element, sigma_ref, el, proto.ex_mat, proto.meas_mat,
        lam=lam,
    )
    v = jnp.asarray(v_frames, jnp.float32)
    dv = v - v[ref_frame][None]
    return np.asarray(imager.reconstruct(dv)), imager


# ---------------------------------------------------------------------------
# Absolute (static) imaging: regularized Gauss-Newton
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_nodes", "ref_node"))
def _fields_jacobian_residual(
    nodes, tris, sigma_e, el_pos, ex_mat, meas_mat, v_meas,
    n_nodes: int, ref_node: int = 0,
):
    """One linearization point: (residual v_meas - v(sigma), J). Shares the
    Cholesky factor between the forward voltages and the adjoint Jacobian
    (each Gauss-Newton iteration is ONE factorization)."""
    with jax.default_matmul_precision("highest"):
        K = assemble_stiffness(nodes, tris, sigma_e, n_nodes)
        K = K.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
        K = K.at[ref_node, ref_node].set(1.0)
        n_el = el_pos.shape[0]
        B_el = jnp.zeros((n_nodes, n_el), K.dtype)
        B_el = B_el.at[el_pos, jnp.arange(n_el)].add(1.0)
        B_el = B_el.at[ref_node, :].set(0.0)
        c, lower = jax.scipy.linalg.cho_factor(K)
        U_el = jax.scipy.linalg.cho_solve((c, lower), B_el)  # (N, n_el)
        u_exc = U_el[:, ex_mat[:, 0]] - U_el[:, ex_mat[:, 1]]
        # forward voltages at the measurement pairs
        u_e = u_exc[el_pos, :].T  # (n_exc, n_el)
        vn = jnp.take_along_axis(u_e, meas_mat[:, :, 0], axis=1)
        vm = jnp.take_along_axis(u_e, meas_mat[:, :, 1], axis=1)
        v = (vn - vm).reshape(-1)
        # adjoint Jacobian (same einsums as _difference_jacobian)
        ke, _ = element_geometry(nodes, tris)
        v_exc = u_exc[tris, :]
        v_el = U_el[tris, :]
        z = jnp.einsum("mij,mje->mie", ke, v_el)
        S = jnp.einsum("mix,mie->xem", v_exc, z)
        Sn = jnp.take_along_axis(S, meas_mat[:, :, 0][:, :, None], axis=1)
        Sm = jnp.take_along_axis(S, meas_mat[:, :, 1][:, :, None], axis=1)
        J = -(Sn - Sm).reshape(-1, S.shape[-1])
        return v_meas.reshape(-1) - v, J


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "ref_node", "n_iter")
)
def _gauss_newton(
    nodes, tris, sigma0, el_pos, ex_mat, meas_mat, v_meas,
    lam, sigma_min, sigma_max, n_nodes: int, ref_node: int, n_iter: int,
):
    def step(sigma, _):
        r, J = _fields_jacobian_residual(
            nodes, tris, sigma, el_pos, ex_mat, meas_mat, v_meas,
            n_nodes, ref_node,
        )
        with jax.default_matmul_precision("highest"):
            G = J @ J.T
            reg = lam * jnp.mean(jnp.diag(G))
            G = G + reg * jnp.eye(G.shape[0], dtype=G.dtype)
            c, _ = jax.scipy.linalg.cho_factor(G)
            w = jax.scipy.linalg.cho_solve((c, False), r)
            ds = J.T @ w
        sigma = jnp.clip(sigma + ds, sigma_min, sigma_max)
        return sigma, jnp.vdot(r, r)
    return jax.lax.scan(step, sigma0, None, length=n_iter)


def gauss_newton_absolute(
    nodes: np.ndarray,
    tris: np.ndarray,
    v_meas: np.ndarray,
    el_pos,
    ex_mat,
    meas_mat,
    n_iter: int = 8,
    lam: float = 1e-2,
    sigma_bounds=(1e-4, 10.0),
    ref_node: int = 0,
):
    """Absolute (static) conductivity imaging by regularized Gauss-Newton.

    Beyond the reference (and beyond pyeit's one-step 'jac' solver): an
    iterative absolute reconstruction, every step fully on device — one
    Cholesky factorization shared by the forward residual and the adjoint
    Jacobian, a measurement-space (n_meas_total^2, ~208^2) regularized
    solve, and a clipped update, iterated under lax.scan.

    Starts from the best-fitting homogeneous conductivity (voltages of the
    point-electrode model scale as 1/sigma, so the optimal homogeneous fit
    has a closed form).

    Returns (sigma (M,) per-element conductivities,
             residual_norms (n_iter,) squared residual per iteration).
    """
    nodes_j = jnp.asarray(nodes, jnp.float32)
    tris_j = jnp.asarray(tris, jnp.int32)
    el = jnp.asarray(el_pos)
    exm = jnp.asarray(ex_mat)
    mm = jnp.asarray(meas_mat)
    vm = jnp.asarray(v_meas, jnp.float32)
    M = tris.shape[0]
    from .solver import forward_solve

    v1 = forward_solve(
        nodes_j, tris_j, jnp.ones((M,), jnp.float32), el, exm, mm,
        nodes.shape[0], ref_node,
    ).reshape(-1)
    # v(s*1) = v1 / s  =>  s* = <v1, v1> / <v_meas, v1>
    s0 = jnp.vdot(v1, v1) / jnp.maximum(jnp.vdot(vm.reshape(-1), v1), 1e-12)
    s0 = jnp.clip(s0, sigma_bounds[0], sigma_bounds[1])
    sigma0 = jnp.full((M,), s0, jnp.float32)
    sigma, res = _gauss_newton(
        nodes_j, tris_j, sigma0, el, exm, mm, vm,
        jnp.float32(lam), jnp.float32(sigma_bounds[0]),
        jnp.float32(sigma_bounds[1]), nodes.shape[0], ref_node, n_iter,
    )
    return np.asarray(sigma), np.asarray(res)
