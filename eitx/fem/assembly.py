"""Batched P1 finite-element stiffness assembly for 2-D conduction.

Replaces the scipy-sparse assembly hidden inside pyeit's EITForward
(reference synthetic_datasets_generator.py:332; pyeit solves one
multiprocessing task per breathing frame at :333-335). Here assembly is a
dense scatter-add compiled by XLA, and — the TPU-native trick — the
stiffness matrix is *linear in per-class conductivity*:

    K(t) = sum_c sigma_c(t) * K_c

so after precomputing one grounded K_c per tissue class, every breathing
frame's system matrix is a single (T, C) x (C, N, N) tensor contraction that
runs on the MXU, and the T frames solve as one batched Cholesky.

Meshes from this pipeline are small (1-6k nodes at lc=7-14), so dense
matrices comfortably beat irregular sparse formats on TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def element_geometry(nodes: jnp.ndarray, tris: jnp.ndarray):
    """Per-element local stiffness geometry factors.

    For linear triangles with vertices p0,p1,p2:
      b_i = y_{i+1} - y_{i+2},  c_i = x_{i+2} - x_{i+1}  (cyclic)
      ke_ij = (b_i b_j + c_i c_j) / (4 A)
    Returns (ke (M,3,3) with unit conductivity, area (M,)).

    Degenerate (near-zero-area) elements — used as static-shape padding —
    contribute an all-zero ke instead of dividing by zero.
    """
    p = nodes[tris]  # (M, 3, 2)
    x = p[..., 0]
    y = p[..., 1]
    roll1 = jnp.array([1, 2, 0])
    roll2 = jnp.array([2, 0, 1])
    b = y[:, roll1] - y[:, roll2]  # (M, 3)
    c = x[:, roll2] - x[:, roll1]  # (M, 3)
    area2 = x[:, 0] * b[:, 0] + x[:, 1] * b[:, 1] + x[:, 2] * b[:, 2]
    area = 0.5 * jnp.abs(area2)
    valid = area > 1e-12
    safe_area = jnp.where(valid, area, 1.0)
    ke = (b[:, :, None] * b[:, None, :] + c[:, :, None] * c[:, None, :]) / (
        4.0 * safe_area[:, None, None]
    )
    ke = jnp.where(valid[:, None, None], ke, 0.0)
    return ke, area


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def assemble_stiffness(
    nodes: jnp.ndarray, tris: jnp.ndarray, cond: jnp.ndarray, n_nodes: int
) -> jnp.ndarray:
    """Dense global stiffness for one per-element conductivity vector."""
    ke, _ = element_geometry(nodes, tris)
    vals = cond[:, None, None] * ke  # (M, 3, 3)
    ii = jnp.broadcast_to(tris[:, :, None], vals.shape)
    jj = jnp.broadcast_to(tris[:, None, :], vals.shape)
    K = jnp.zeros((n_nodes, n_nodes), dtype=vals.dtype)
    return K.at[ii, jj].add(vals)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class ClassStiffness:
    """Per-tissue-class grounded stiffness matrices.

    k_class: (C, N, N) — rows/cols of the reference node zeroed per class.
    diag_fix: (N,) with 1.0 at the reference node and at every padding node
    (isolated rows that would otherwise make K singular), added back after
    the per-frame weighted sum.

    Static-shape bucketing: ``pad_nodes_to`` / ``pad_elems_to`` round the
    node/element counts up to a bucket multiple so ONE compiled solver
    program serves every subject mesh in the bucket — essential when each
    fresh shape costs an XLA (remote) compile measured in minutes.
    """

    k_class: jnp.ndarray
    diag_fix: jnp.ndarray
    ref_node: int
    n_nodes: int  # padded size
    n_real_nodes: int
    n_classes: int
    # host-side copies of the padded connectivity (numpy): lets the
    # spectral solvers derive per-class node sets (lung-subspace indices)
    # without a device->host readback — on relay-attached chips every
    # readback is a link round-trip, and build_batch paid one per subject
    tris_host: np.ndarray = None
    elem_class_host: np.ndarray = None
    grounded: bool = True

    @classmethod
    def build(
        cls,
        nodes: np.ndarray,
        tris: np.ndarray,
        elem_class: np.ndarray,
        n_classes: int,
        ref_node: int = 0,
        dtype=jnp.float32,
        pad_nodes_to: int = 1,
        pad_elems_to: int = 1,
        ground_ref: bool = True,
    ) -> "ClassStiffness":
        nodes = np.asarray(nodes, dtype=np.float64)
        tris = np.asarray(tris, dtype=np.int64)
        elem_class = np.asarray(elem_class, dtype=np.int64)
        n_real = nodes.shape[0]
        n_pad = _round_up(n_real, max(pad_nodes_to, 1))
        m_pad = _round_up(tris.shape[0], max(pad_elems_to, 1))
        if n_pad > n_real:
            nodes = np.vstack([nodes, np.zeros((n_pad - n_real, 2))])
        if m_pad > tris.shape[0]:
            extra = m_pad - tris.shape[0]
            # degenerate (zero-area) elements on node 0: zero contribution
            tris = np.vstack([tris, np.zeros((extra, 3), dtype=np.int64)])
            # pad with -1 (no valid class): one_hot(-1) is an all-zero
            # row, so k_class is unchanged, and host-side per-class
            # consumers (elem_class_host == cid) never match padding —
            # padding with 0 aliased real class 0 (round-4 advice)
            elem_class = np.concatenate(
                [elem_class, np.full((extra,), -1, dtype=np.int64)]
            )

        nodes_j = jnp.asarray(nodes, dtype=dtype)
        tris_j = jnp.asarray(tris, dtype=jnp.int32)
        onehot = jax.nn.one_hot(
            jnp.asarray(elem_class, dtype=jnp.int32), n_classes, dtype=dtype
        )  # (M, C)

        def one_class(w):
            return assemble_stiffness(nodes_j, tris_j, w, n_pad)

        k = jax.vmap(one_class, in_axes=1)(onehot)  # (C, N, N)
        diag_fix = np.zeros((n_pad,), dtype=np.float64)
        if ground_ref:
            # Ground the reference node inside each class matrix (point-
            # electrode gauge; the CEM grounds an electrode instead).
            k = k.at[:, ref_node, :].set(0.0)
            k = k.at[:, :, ref_node].set(0.0)
            diag_fix[ref_node] = 1.0
        diag_fix[n_real:] = 1.0
        return cls(
            k_class=k,
            diag_fix=jnp.asarray(diag_fix, dtype=dtype),
            ref_node=ref_node,
            n_nodes=n_pad,
            n_real_nodes=n_real,
            n_classes=n_classes,
            tris_host=tris,
            elem_class_host=elem_class,
            grounded=ground_ref,
        )

    def system_matrices(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """K(t) for per-class conductivities sigma (T, C) -> (T, N, N)."""
        K = jnp.tensordot(sigma, self.k_class, axes=([1], [0]))
        return K + jnp.diag(self.diag_fix)[None]
