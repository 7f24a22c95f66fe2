"""Batched EIT forward solves.

The reference runs one full scipy-sparse FEM solve per breathing frame in a
multiprocessing pool (synthetic_datasets_generator.py:333-335,239). Here the
whole monitoring run is ONE compiled XLA program:

  sigma (T, C)  --MXU-->  K (T, N, N)  --batched Cholesky-->  U (T, N, E)
                                        --gather/diff-->      V (T, E, n_meas)

with T breathing frames and E excitations solved simultaneously. For
multi-chip scale the T axis shards over the device mesh (see
eitx.parallel) — frames are embarrassingly parallel, so the only collective
is the final all-gather of voltage frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .assembly import ClassStiffness, assemble_stiffness


def _rhs_matrix(el_pos: jnp.ndarray, ex_mat: jnp.ndarray, n_nodes: int, dtype):
    """(N, n_exc) current injection vectors: +1 at node el_pos[a], -1 at
    el_pos[b] (pyeit natural-boundary convention)."""
    n_exc = ex_mat.shape[0]
    B = jnp.zeros((n_nodes, n_exc), dtype=dtype)
    a_nodes = el_pos[ex_mat[:, 0]]
    b_nodes = el_pos[ex_mat[:, 1]]
    cols = jnp.arange(n_exc)
    B = B.at[a_nodes, cols].add(1.0)
    B = B.at[b_nodes, cols].add(-1.0)
    return B


def _measure(u_el: jnp.ndarray, meas_mat: jnp.ndarray) -> jnp.ndarray:
    """u_el (E, n_exc) electrode potentials -> (n_exc, n_meas) differences
    v = u[n] - u[m] for meas_mat (n_exc, n_meas, 2)=[n, m]."""
    u = u_el.T  # (n_exc, E)
    n_idx = meas_mat[:, :, 0]
    m_idx = meas_mat[:, :, 1]
    vn = jnp.take_along_axis(u, n_idx, axis=1)
    vm = jnp.take_along_axis(u, m_idx, axis=1)
    return vn - vm


@functools.partial(jax.jit, static_argnames=("n_nodes", "ref_node"))
def forward_solve(
    nodes, tris, cond, el_pos, ex_mat, meas_mat, n_nodes: int, ref_node: int = 0
):
    """Single-frame forward solve with per-element conductivity ``cond``.

    Returns (n_exc, n_meas) voltage differences — the pyeit
    EITForward.solve_eit equivalent for one conductivity distribution.
    """
    with jax.default_matmul_precision("highest"):
        K = assemble_stiffness(nodes, tris, cond, n_nodes)
        K = K.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
        K = K.at[ref_node, ref_node].set(1.0)
        B = _rhs_matrix(el_pos, ex_mat, n_nodes, K.dtype)
        B = B.at[ref_node, :].set(0.0)
        c, lower = jax.scipy.linalg.cho_factor(K)
        U = jax.scipy.linalg.cho_solve((c, lower), B)  # (N, n_exc)
        return _measure(U[el_pos, :], meas_mat)


def forward_solve_batched(
    cs: ClassStiffness,
    sigma: jnp.ndarray,
    el_pos: jnp.ndarray,
    ex_mat: jnp.ndarray,
    meas_mat: jnp.ndarray,
) -> jnp.ndarray:
    """All breathing frames at once.

    Args:
      cs: precomputed per-class grounded stiffness matrices.
      sigma: (T, C) per-class conductivities per frame.
      el_pos/ex_mat/meas_mat: electrode nodes and protocol arrays.
    Returns:
      (T, n_exc, n_meas) voltages.
    """
    return _forward_solve_batched(
        cs.k_class, cs.diag_fix, cs.ref_node, sigma, el_pos, ex_mat, meas_mat
    )


@functools.partial(jax.jit, static_argnames=("ref_node",))
def _forward_solve_batched(
    k_class, diag_fix, ref_node, sigma, el_pos, ex_mat, meas_mat
):
    n_nodes = k_class.shape[-1]
    sigma = sigma.astype(k_class.dtype)
    # FEM solves need true f32 accumulation: force HIGHEST matmul precision
    # so the MXU does not drop to bf16 passes inside the contraction,
    # Cholesky, and triangular solves.
    with jax.default_matmul_precision("highest"):
        # Voltages are 1/alpha-homogeneous in conductivity: solving with
        # sigma/s and dividing the result by s keeps the Cholesky operating
        # on a well-scaled matrix (better f32 conditioning across frames).
        scale = jnp.mean(sigma, axis=1, keepdims=True)  # (T, 1)
        K = jnp.tensordot(
            sigma / scale, k_class, axes=([1], [0]),
            precision=jax.lax.Precision.HIGHEST,
        )  # (T, N, N) on MXU
        K = K + jnp.diag(diag_fix)[None]  # ref node + padding nodes
        B = _rhs_matrix(el_pos, ex_mat, n_nodes, k_class.dtype)
        B = B.at[ref_node, :].set(0.0)

        def solve_one(Kt):
            c, lower = jax.scipy.linalg.cho_factor(Kt)
            U = jax.scipy.linalg.cho_solve((c, lower), B)
            # One step of iterative refinement claws back ~an order of
            # magnitude of f32 round-off for a matmul + triangular solve.
            R = B - Kt @ U
            U = U + jax.scipy.linalg.cho_solve((c, lower), R)
            return _measure(U[el_pos, :], meas_mat)

        v = jax.vmap(solve_one)(K)
        return v / scale[:, :, None]


def forward_solve_cg(
    cs: ClassStiffness,
    sigma: jnp.ndarray,
    el_pos: jnp.ndarray,
    ex_mat: jnp.ndarray,
    meas_mat: jnp.ndarray,
    tol: float = 1e-6,
    maxiter: int = 800,
) -> jnp.ndarray:
    """Matrix-free-ish CG fallback for meshes too large for dense Cholesky.

    The matvec keeps the dense (C, N, N) class matrices but never factorizes;
    preconditioned by the diagonal. Same (T, n_exc, n_meas) output.
    """
    k_class = cs.k_class
    ref = cs.ref_node
    n_nodes = k_class.shape[-1]
    B = _rhs_matrix(el_pos, ex_mat, n_nodes, k_class.dtype)
    B = B.at[ref, :].set(0.0)

    def one_frame(sig):
        K = jnp.tensordot(
            sig, k_class, axes=([0], [0]), precision=jax.lax.Precision.HIGHEST
        )
        K = K + jnp.diag(cs.diag_fix)
        diag = jnp.clip(jnp.diag(K), 1e-30)

        def mv(x):
            return K @ x

        def pc(x):
            return x / diag[:, None]

        U, _ = jax.scipy.sparse.linalg.cg(mv, B, tol=tol, maxiter=maxiter, M=pc)
        return _measure(U[el_pos, :], meas_mat)

    return jax.jit(jax.vmap(one_frame))(sigma.astype(k_class.dtype))
