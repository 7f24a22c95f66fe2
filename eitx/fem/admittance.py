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


def simulate_eit_spectroscopy(
    mesh_data,
    freqs,
    classes=None,
    cfg=None,
    materials_location=None,
):
    """Multi-frequency EIT sweep: complex voltages at every frequency.

    EIT spectroscopy — solve the complex admittance problem y = sigma(f) +
    j*omega*eps0*eps_r(f) for a whole frequency grid in one vmapped XLA
    program. The reference's materials tables are frequency-resolved
    (femm_api.py:50-74) but its pipeline only ever evaluates one working
    frequency; the batched solver makes the full sweep as cheap per
    frequency as a single solve. Returns (F, n_exc, n_meas) complex128.
    """
    import numpy as np

    from ..core.config import ClassMap, SimulationConfig
    from ..physio.materials import get_materials, interp_at_freq
    from .electrodes import place_electrodes_equal_spacing
    from .forward import compact_mesh_nodes, prepare_mesh_info
    from .protocol import create_protocol

    classes = classes or ClassMap()
    cfg = cfg or SimulationConfig()
    info = compact_mesh_nodes(prepare_mesh_info(mesh_data, classes))
    mats = get_materials(materials_location)
    id_to_name = classes.id_to_name()
    freqs = np.asarray(freqs, np.float64)
    F = freqs.shape[0]
    M = info.element.shape[0]
    sig = np.zeros((F, M), np.float32)
    eps = np.zeros((F, M), np.float32)
    for cid, name in id_to_name.items():
        sel = info.cond == cid
        if not sel.any():
            continue
        for k, f in enumerate(freqs):
            sig[k, sel] = interp_at_freq(mats[name]["cond"], float(f))
            eps[k, sel] = interp_at_freq(mats[name]["perm"], float(f))
    el = place_electrodes_equal_spacing(
        info.node, info.element, cfg.n_electrodes,
        starting_angle=np.pi * cfg.starting_angle_deg / 180.0,
    )
    proto = create_protocol(
        cfg.n_electrodes, cfg.dist_exc, cfg.step_meas, cfg.parser_meas
    )
    n_nodes = info.node.shape[0]
    nodes_j = jnp.asarray(info.node, jnp.float32)
    tris_j = jnp.asarray(info.element, jnp.int32)

    def one(s, e, f):
        return forward_solve_admittance(
            nodes_j, tris_j, s, e, f, jnp.asarray(el),
            jnp.asarray(proto.ex_mat), jnp.asarray(proto.meas_mat), n_nodes,
        )

    v = jax.vmap(one)(
        jnp.asarray(sig), jnp.asarray(eps), jnp.asarray(freqs, jnp.float32)
    )
    return np.asarray(v)


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
