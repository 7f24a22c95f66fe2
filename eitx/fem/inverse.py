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


@functools.partial(jax.jit, static_argnames=("n_nodes", "ref_node"))
def _difference_jacobian(
    nodes, tris, sigma_e, el_pos, ex_mat, meas_mat, n_nodes: int,
    ref_node: int = 0,
):
    """(n_exc * n_meas, M) sensitivity of measured differences to
    per-element conductivity, via the adjoint fields."""
    with jax.default_matmul_precision("highest"):
        K = assemble_stiffness(nodes, tris, sigma_e, n_nodes)
        K = K.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
        K = K.at[ref_node, ref_node].set(1.0)
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
    imager = DifferenceImager.build(
        info.node, info.element, sigma_ref, el, proto.ex_mat, proto.meas_mat,
        lam=lam,
    )
    v = jnp.asarray(v_frames, jnp.float32)
    dv = v - v[ref_frame][None]
    return np.asarray(imager.reconstruct(dv)), imager
