"""Complex-admittance forward solver (FEMM current-flow physics).

The reference's legacy path runs FEMM AC current-flow problems where each
tissue carries conductivity AND permittivity at the working frequency
(femm_api.py:77-88). The element coefficient there is the complex
admittivity  y = sigma + j*omega*eps0*eps_r.  The pyeit path drops the
imaginary part; this solver keeps it, so both reference solver families
are covered by one FEM core.

TPU note: complex LU support is uneven across backends, so the complex
system  (Kr + j*Ki) u = b  solves as the equivalent real block system

    [ Kr  -Ki ] [ur]   [br]
    [ Ki   Kr ] [ui] = [0 ]

with a real LU — portable everywhere XLA runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .assembly import assemble_stiffness
from .solver import _measure, _rhs_matrix

EPS0 = 8.8541878128e-12


@functools.partial(jax.jit, static_argnames=("n_nodes", "ref_node"))
def forward_solve_admittance(
    nodes,
    tris,
    sigma_e,
    eps_r_e,
    freq_hz,
    el_pos,
    ex_mat,
    meas_mat,
    n_nodes: int,
    ref_node: int = 0,
):
    """Complex voltages (n_exc, n_meas) for per-element sigma and eps_r."""
    with jax.default_matmul_precision("highest"):
        omega = 2.0 * jnp.pi * freq_hz
        Kr = assemble_stiffness(nodes, tris, sigma_e, n_nodes)
        Ki = assemble_stiffness(
            nodes, tris, omega * EPS0 * eps_r_e, n_nodes
        )

        def ground(K, diag):
            K = K.at[ref_node, :].set(0.0).at[:, ref_node].set(0.0)
            return K.at[ref_node, ref_node].set(diag)

        Kr = ground(Kr, 1.0)
        Ki = ground(Ki, 0.0)
        B = _rhs_matrix(el_pos, ex_mat, n_nodes, Kr.dtype)
        B = B.at[ref_node, :].set(0.0)
        n = n_nodes
        big = jnp.zeros((2 * n, 2 * n), Kr.dtype)
        big = big.at[:n, :n].set(Kr).at[:n, n:].set(-Ki)
        big = big.at[n:, :n].set(Ki).at[n:, n:].set(Kr)
        rhs = jnp.concatenate([B, jnp.zeros_like(B)], axis=0)
        U = jnp.linalg.solve(big, rhs)
        u = U[:n] + 1j * U[n:]
        u_el = u[el_pos, :]
        vr = _measure(jnp.real(u_el), meas_mat)
        vi = _measure(jnp.imag(u_el), meas_mat)
        return vr + 1j * vi
