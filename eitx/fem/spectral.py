"""Spectral (rank-structured) EIT monitoring solver.

Breathing only modulates the lung conductivity (reference
process_EIT_projection, synthetic_datasets_generator.py:242-258), so every
frame's system matrix is a one-parameter pencil

    K(a) = K_base + (a - a0) * K_lung .

Factor once:  K_base = L L^T,  B = L^-1 K_lung L^-T = Q diag(lam) Q^T, then

    K(a)^-1 b = L^-T Q diag(1 / (1 + (a - a0) lam)) Q^T L^-1 b .

With the injection block Y0 = Q^T L^-1 B_rhs and the electrode readout
Z = (L^-T Q)[el_pos] both precomputed, a frame costs one (N,) rescale and
one (E x N) @ (N x n_exc) matmul — about 1e6 FLOPs instead of an O(N^3)
factorization. A breathing run of any length amortizes one eigh.

Setup cost: one Cholesky + two triangular solves + one symmetric eigh
(O(N^3), on the MXU). Accuracy is validated against the direct batched
Cholesky path in tests.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import ClassStiffness
from .solver import _measure, _rhs_matrix


@dataclass
class SpectralEITSolver:
    lam: jnp.ndarray  # (N,) eigenvalues of the pencil
    y0: jnp.ndarray  # (N, n_exc) transformed injection block
    z: jnp.ndarray  # (E, N) electrode readout rows
    alpha0: float
    meas_mat: jnp.ndarray

    @classmethod
    def build(
        cls,
        cs: ClassStiffness,
        sigma_base: np.ndarray,  # (C,) per-class conductivities
        lung_class: int,
        el_pos,
        ex_mat,
        meas_mat,
        alpha0: float,
    ) -> "SpectralEITSolver":
        lam, y0, z = _spectral_setup(
            cs.k_class,
            cs.diag_fix,
            cs.ref_node,
            jnp.asarray(sigma_base, cs.k_class.dtype),
            lung_class,
            jnp.asarray(el_pos),
            jnp.asarray(ex_mat),
            jnp.float32(alpha0).astype(cs.k_class.dtype),
        )
        return cls(
            lam=lam, y0=y0, z=z, alpha0=float(alpha0),
            meas_mat=jnp.asarray(meas_mat),
        )

    @classmethod
    def build_general(
        cls,
        k_class: jnp.ndarray,  # (C, D, D) pencil matrices
        fixed: jnp.ndarray,  # (D, D) conductivity-independent part
        sigma_base: np.ndarray,
        lung_class: int,
        rhs: jnp.ndarray,  # (D, n_exc) injection block
        readout_rows,  # (E,) rows whose potentials are measured
        meas_mat,
        alpha0: float,
    ) -> "SpectralEITSolver":
        """Spectral factorization for any SPD pencil K(a) = K_base + dK*a —
        used by the complete electrode model, whose augmented system keeps
        the same one-parameter structure (boundary blocks live in
        ``fixed``; readout rows are the electrode potentials)."""
        lam, y0, z = _spectral_setup_general(
            k_class,
            fixed,
            jnp.asarray(sigma_base, k_class.dtype),
            lung_class,
            jnp.asarray(rhs, k_class.dtype),
            jnp.asarray(readout_rows),
            jnp.asarray(alpha0, k_class.dtype),
        )
        return cls(
            lam=lam, y0=y0, z=z, alpha0=float(alpha0),
            meas_mat=jnp.asarray(meas_mat),
        )

    def solve(self, lung_alphas) -> jnp.ndarray:
        """(T,) lung conductivities -> (T, n_exc, n_meas) voltages."""
        return _spectral_solve(
            self.lam, self.y0, self.z,
            jnp.asarray(lung_alphas, self.lam.dtype),
            jnp.asarray(self.alpha0, self.lam.dtype),
            self.meas_mat,
        )

    @classmethod
    def build_batch(
        cls,
        cs_list,
        sigma_base: np.ndarray,
        lung_class: int,
        el_pos_list,
        ex_mat,
        meas_mat,
        alpha0s,
    ):
        """Factor MANY subjects' pencils in one vmapped program.

        All subjects must share one padded node bucket (same k_class shape —
        that is what ClassStiffness.build's pad_nodes_to buckets exist for):
        the per-subject Cholesky + eigh then batch on the MXU instead of
        running B sequential O(N^3) setups. Returns a list of solvers.
        """
        k_stack = jnp.stack([cs.k_class for cs in cs_list])  # (B, C, N, N)
        d_stack = jnp.stack([cs.diag_fix for cs in cs_list])  # (B, N)
        ref_nodes = {cs.ref_node for cs in cs_list}
        if len(ref_nodes) != 1:
            raise ValueError("batched subjects must share ref_node")
        el_stack = jnp.asarray(np.stack([np.asarray(e) for e in el_pos_list]))
        dtype = cs_list[0].k_class.dtype
        a0 = jnp.asarray(np.asarray(alpha0s), dtype)
        sig = jnp.asarray(sigma_base, dtype)
        lam, y0, z = _spectral_setup_batch(
            k_stack, d_stack, ref_nodes.pop(), sig, lung_class,
            el_stack, jnp.asarray(ex_mat), a0,
        )
        meas = jnp.asarray(meas_mat)
        return [
            cls(lam=lam[b], y0=y0[b], z=z[b], alpha0=float(alpha0s[b]),
                meas_mat=meas)
            for b in range(len(cs_list))
        ]


@functools.partial(jax.jit, static_argnames=("lung_class", "ref_node"))
def _spectral_setup(
    k_class, diag_fix, ref_node, sigma_base, lung_class, el_pos, ex_mat, alpha0
):
    with jax.default_matmul_precision("highest"):
        n = k_class.shape[-1]
        sig = sigma_base.at[lung_class].set(alpha0)
        K_base = jnp.tensordot(
            sig, k_class, axes=([0], [0]),
            precision=jax.lax.Precision.HIGHEST,
        ) + jnp.diag(diag_fix)
        Kl = k_class[lung_class]
        L = jnp.linalg.cholesky(K_base)
        # B = L^-1 Kl L^-T  (two triangular solves)
        X = jax.scipy.linalg.solve_triangular(L, Kl, lower=True)
        B = jax.scipy.linalg.solve_triangular(L, X.T, lower=True).T
        B = 0.5 * (B + B.T)
        lam, Q = jnp.linalg.eigh(B)
        Brhs = _rhs_matrix(el_pos, ex_mat, n, k_class.dtype)
        Brhs = Brhs.at[ref_node, :].set(0.0)
        y0 = Q.T @ jax.scipy.linalg.solve_triangular(L, Brhs, lower=True)
        # Z = (L^-T Q)[el_pos] : solve L^T W = Q, take electrode rows
        W = jax.scipy.linalg.solve_triangular(L.T, Q, lower=False)
        z = W[el_pos, :]
        return lam, y0, z


@functools.partial(jax.jit, static_argnames=("lung_class", "ref_node"))
def _spectral_setup_batch(
    k_stack, d_stack, ref_node, sigma_base, lung_class, el_stack, ex_mat, a0s
):
    """vmap of _spectral_setup over the subject axis (shared sigma_base)."""

    def one(k_class, diag_fix, el_pos, alpha0):
        return _spectral_setup(
            k_class, diag_fix, ref_node, sigma_base, lung_class,
            el_pos, ex_mat, alpha0,
        )

    return jax.vmap(one)(k_stack, d_stack, el_stack, a0s)


@functools.partial(jax.jit, static_argnames=("lung_class",))
def _spectral_setup_general(
    k_class, fixed, sigma_base, lung_class, rhs, readout_rows, alpha0
):
    with jax.default_matmul_precision("highest"):
        sig = sigma_base.at[lung_class].set(alpha0)
        K_base = jnp.tensordot(
            sig, k_class, axes=([0], [0]),
            precision=jax.lax.Precision.HIGHEST,
        ) + fixed
        Kl = k_class[lung_class]
        L = jnp.linalg.cholesky(K_base)
        X = jax.scipy.linalg.solve_triangular(L, Kl, lower=True)
        B = jax.scipy.linalg.solve_triangular(L, X.T, lower=True).T
        B = 0.5 * (B + B.T)
        lam, Q = jnp.linalg.eigh(B)
        y0 = Q.T @ jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        W = jax.scipy.linalg.solve_triangular(L.T, Q, lower=False)
        z = W[readout_rows, :]
        return lam, y0, z


@jax.jit
def _spectral_solve(lam, y0, z, alphas, alpha0, meas_mat):
    with jax.default_matmul_precision("highest"):
        denom = 1.0 + (alphas[:, None] - alpha0) * lam[None, :]  # (T, N)
        # Fold electrode readout AND the measurement differences into one
        # frame-independent operator H[x,m,n] = (z[n_row]-z[m_row])*y0 so
        # the entire monitoring is ONE (T, N) x (N, n_exc*n_meas) matmul.
        # The earlier formulation stopped at electrode potentials and ran
        # a vmapped per-frame gather/subtract tail, which measured at
        # ~10 GFLOP/s — gather-bound, 1000x under the MXU.
        n_idx = meas_mat[:, :, 0]  # (n_exc, n_meas)
        m_idx = meas_mat[:, :, 1]
        H = (z[n_idx] - z[m_idx]) * y0.T[:, None, :]  # (n_exc, n_meas, N)
        flat = (1.0 / denom) @ H.reshape(-1, H.shape[-1]).T
        return flat.reshape(alphas.shape[0], *n_idx.shape)


# ---------------------------------------------------------------------------
# Low-rank (lung-subspace) spectral solver
# ---------------------------------------------------------------------------


@dataclass
class LowRankSpectralSolver:
    """Monitoring solver factoring the pencil on the LUNG SUBSPACE only.

    Breathing perturbs K on lung-element nodes alone, so K_lung = S Kl_s S^T
    with S selecting the m lung nodes (m << N). Factor Kl_s = R R^T (small
    eigh), set U = L^-1 S R, thin-diagonalize U^T U = V diag(s2) V^T, and by
    Woodbury

        K(a)^-1 = L^-T (I - Q diag(f(a)) Q^T) L^-1,
        Q = U V diag(s2)^-1/2,   f(a) = (a-a0) s2 / (1 + (a-a0) s2),

    so setup needs one Cholesky + two eighs of size r (the padded lung-node
    bucket) instead of one eigh of size N — the O(N^3) eigh was the whole
    per-subject setup cost of :class:`SpectralEITSolver`. A frame costs one
    (E*n_exc, r) matmul against f(a).
    """

    s2: jnp.ndarray  # (r,) squared singular values of U (0 in dead slots)
    u0: jnp.ndarray  # (E, n_exc) baseline electrode potentials at alpha0
    yq: jnp.ndarray  # (r, n_exc)
    zq: jnp.ndarray  # (E, r)
    alpha0: float
    meas_mat: jnp.ndarray

    @classmethod
    def build(
        cls,
        cs: ClassStiffness,
        sigma_base: np.ndarray,
        lung_class: int,
        el_pos,
        ex_mat,
        meas_mat,
        alpha0: float,
        rank_bucket: int = 256,
    ) -> "LowRankSpectralSolver":
        idx, mask = _lung_subspace_indices(cs, lung_class, rank_bucket)
        s2, u0, yq, zq = _lowrank_setup(
            cs.k_class,
            cs.diag_fix,
            cs.ref_node,
            jnp.asarray(sigma_base, cs.k_class.dtype),
            lung_class,
            jnp.asarray(idx),
            jnp.asarray(mask, cs.k_class.dtype),
            jnp.asarray(el_pos),
            jnp.asarray(ex_mat),
            jnp.float32(alpha0).astype(cs.k_class.dtype),
        )
        return cls(
            s2=s2, u0=u0, yq=yq, zq=zq, alpha0=float(alpha0),
            meas_mat=jnp.asarray(meas_mat),
        )

    @classmethod
    def build_general(
        cls,
        k_class: jnp.ndarray,  # (C, D, D) pencil matrices
        fixed: jnp.ndarray,  # (D, D) conductivity-independent part
        sigma_base: np.ndarray,
        lung_class: int,
        rhs: jnp.ndarray,  # (D, n_exc) injection block (pre-grounded)
        readout_rows,  # (E,) rows whose potentials are measured
        meas_mat,
        alpha0: float,
        rank_bucket: int = 256,
    ) -> "LowRankSpectralSolver":
        """Low-rank factorization for any SPD pencil K(a) = K_base + dK*a
        whose varying part has small support — the CEM's augmented system
        keeps the lung-block structure (electrode rows live in ``fixed``)."""
        diag = np.asarray(jnp.diagonal(k_class[lung_class]))
        idx, mask = _indices_from_diag(diag, k_class.shape[-1], rank_bucket)
        s2, u0, yq, zq = _lowrank_setup_general(
            k_class,
            fixed,
            jnp.asarray(sigma_base, k_class.dtype),
            lung_class,
            jnp.asarray(idx),
            jnp.asarray(mask, k_class.dtype),
            jnp.asarray(rhs, k_class.dtype),
            jnp.asarray(readout_rows),
            jnp.asarray(alpha0, k_class.dtype),
        )
        return cls(
            s2=s2, u0=u0, yq=yq, zq=zq, alpha0=float(alpha0),
            meas_mat=jnp.asarray(meas_mat),
        )

    @classmethod
    def build_batch(
        cls,
        cs_list,
        sigma_base: np.ndarray,
        lung_class: int,
        el_pos_list,
        ex_mat,
        meas_mat,
        alpha0s,
        rank_bucket: int = 256,
    ):
        """Factor many same-bucket subjects' lung pencils in one vmapped
        program (the batch analogue of :meth:`SpectralEITSolver.build_batch`,
        with the O(N^3) eigh shrunk to the shared lung-rank bucket)."""
        ref_nodes = {cs.ref_node for cs in cs_list}
        if len(ref_nodes) != 1:
            raise ValueError("batched subjects must share ref_node")
        pairs = [
            _lung_subspace_indices(cs, lung_class, rank_bucket)
            for cs in cs_list
        ]
        r = max(p[0].shape[0] for p in pairs)
        idxs = np.stack([np.pad(p[0], (0, r - p[0].shape[0])) for p in pairs])
        masks = np.stack(
            [np.pad(p[1], (0, r - p[1].shape[0])) for p in pairs]
        )
        dtype = cs_list[0].k_class.dtype
        k_stack = jnp.stack([cs.k_class for cs in cs_list])
        d_stack = jnp.stack([cs.diag_fix for cs in cs_list])
        el_stack = jnp.asarray(np.stack([np.asarray(e) for e in el_pos_list]))
        a0 = jnp.asarray(np.asarray(alpha0s), dtype)
        sig = jnp.asarray(sigma_base, dtype)
        ref = ref_nodes.pop()

        s2, u0, yq, zq = _lowrank_setup_batch(
            k_stack, d_stack, ref, sig, lung_class,
            jnp.asarray(idxs), jnp.asarray(masks, dtype),
            el_stack, jnp.asarray(ex_mat), a0,
        )
        meas = jnp.asarray(meas_mat)
        return [
            cls(s2=s2[b], u0=u0[b], yq=yq[b], zq=zq[b],
                alpha0=float(alpha0s[b]), meas_mat=meas)
            for b in range(len(cs_list))
        ]

    def solve(self, lung_alphas) -> jnp.ndarray:
        """(T,) lung conductivities -> (T, n_exc, n_meas) voltages."""
        return _lowrank_solve(
            self.s2, self.u0, self.yq, self.zq,
            jnp.asarray(lung_alphas, self.s2.dtype),
            jnp.asarray(self.alpha0, self.s2.dtype),
            self.meas_mat,
        )


def _lung_subspace_indices(
    cs: ClassStiffness, lung_class: int, rank_bucket: int
):
    """Host-side lung-node index extraction, padded to the rank bucket.

    Computed from the host connectivity copy when available (zero device
    traffic — the old (N,) diagonal readback cost one relay round-trip
    PER SUBJECT, which is why the round-2 batched setup barely gained).
    Padding slots point at node 0 with a zero mask (their scattered
    contributions vanish). The grounded reference node is excluded, like
    its zeroed row in k_class[lung] excluded it from the diag test.
    """
    if cs.tris_host is not None:
        sel = cs.elem_class_host == lung_class
        nodes = np.unique(cs.tris_host[sel])
        if cs.grounded:
            nodes = nodes[nodes != cs.ref_node]
        nodes = nodes.astype(np.int64)
        diag = np.zeros((cs.n_nodes,), np.float64)
        diag[nodes] = 1.0
        return _indices_from_diag(diag, cs.n_nodes, rank_bucket)
    diag = np.asarray(jnp.diagonal(cs.k_class[lung_class]))
    return _indices_from_diag(diag, cs.n_nodes, rank_bucket)


def _indices_from_diag(diag: np.ndarray, n: int, rank_bucket: int):
    lung_nodes = np.flatnonzero(diag > 0)
    m = lung_nodes.shape[0]
    r = max(_round_up_int(m, rank_bucket), rank_bucket)
    r = min(r, n)
    if m > r:  # lung covers (almost) the whole mesh: keep full size
        r = n
    idx = np.zeros((r,), np.int32)
    idx[: min(m, r)] = lung_nodes[: min(m, r)]
    mask = np.zeros((r,), np.float64)
    mask[: min(m, r)] = 1.0
    return idx, mask


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lowrank_core(K_base, Kl, idx, mask, Brhs, readout_rows):
    """Shared Woodbury factorization given assembled K_base and the lung
    pencil block. Returns (s2, u0, yq, zq).

    TPU scheduling (round-4 setup-amortization work, measured by
    eitx/scripts/profile_setup.py): the ONLY stage with real per-subject
    device cost is the r x r eigh (23 ms/subject batched at r=768 vs
    3-5 ms for the N=2560 Cholesky/trisolve/tensordot stages), and the
    original factorization ran TWO of them (square-root of the lung
    block, then diagonalization of the projected gram). This version
    needs ONE:

        A := L^-1 Kl L^-T = P Kl_s P^T,   P = L^-1 S,
        G := P^T P = C C^T (small Cholesky),
        C^T Kl_s C = Z diag(mu) Z^T      <- the single eigh,
        Q := P C^-T Z  =>  A = Q diag(mu) Q^T,  Q^T Q = I.

    The lung-block square-root disappears entirely — Kl_s enters only
    through the congruence C^T Kl_s C — and the substitution is EXACT
    (no diagonal shift; the earlier Cholesky-square-root attempt needed
    one and tripled the oracle error). Dead (padding) slots: zero P
    columns, unit G diagonal, mu = 0 -> f(a) = 0, inert. The four
    N-sized triangular solves also fuse into two multi-RHS solves.
    """
    n = K_base.shape[-1]
    r = idx.shape[0]
    # lung-subspace block, padded slots masked out
    Kl_s = Kl[idx][:, idx] * (mask[:, None] * mask[None, :])
    # S: one-hot lung-node selector (dead slots zero)
    S = jnp.zeros((n, r), K_base.dtype).at[idx, jnp.arange(r)].set(mask)
    L = jnp.linalg.cholesky(K_base)
    C_all = jax.scipy.linalg.solve_triangular(
        L, jnp.concatenate([S, Brhs], axis=1), lower=True
    )  # (N, r + n_exc)
    P, C0 = C_all[:, :r], C_all[:, r:]
    G = P.T @ P + jnp.diag(1.0 - mask)
    G = 0.5 * (G + G.T)
    C = jnp.linalg.cholesky(G)  # r x r
    Bt = C.T @ (Kl_s @ C)
    Bt = 0.5 * (Bt + Bt.T)
    s2, Z = jnp.linalg.eigh(Bt)  # the single r x r eigh
    eps = jnp.maximum(s2.max(), 0.0) * 1e-7
    live = s2 > eps
    s2 = jnp.where(live, s2, 0.0)
    Y = jax.scipy.linalg.solve_triangular(
        C.T, jnp.where(live[None, :], Z, 0.0), lower=False
    )  # C^-T Z, dead columns zeroed
    Q = P @ Y  # (N, r): orthonormal live columns of A's eigenbasis
    W_all = jax.scipy.linalg.solve_triangular(
        L.T, jnp.concatenate([Q, C0], axis=1), lower=False
    )[readout_rows]  # (E, r + n_exc)
    zq, u0 = W_all[:, :r], W_all[:, r:]
    yq = Q.T @ C0  # (r, n_exc)
    return s2, u0, yq, zq


@functools.partial(jax.jit, static_argnames=("lung_class", "ref_node"))
def _lowrank_setup(
    k_class, diag_fix, ref_node, sigma_base, lung_class, idx, mask,
    el_pos, ex_mat, alpha0,
):
    with jax.default_matmul_precision("highest"):
        n = k_class.shape[-1]
        sig = sigma_base.at[lung_class].set(alpha0)
        K_base = jnp.tensordot(
            sig, k_class, axes=([0], [0]),
            precision=jax.lax.Precision.HIGHEST,
        ) + jnp.diag(diag_fix)
        Brhs = _rhs_matrix(el_pos, ex_mat, n, k_class.dtype)
        Brhs = Brhs.at[ref_node, :].set(0.0)
        return _lowrank_core(K_base, k_class[lung_class], idx, mask, Brhs, el_pos)


@functools.partial(jax.jit, static_argnames=("lung_class",))
def _lowrank_setup_general(
    k_class, fixed, sigma_base, lung_class, idx, mask, rhs, readout_rows,
    alpha0,
):
    with jax.default_matmul_precision("highest"):
        sig = sigma_base.at[lung_class].set(alpha0)
        K_base = jnp.tensordot(
            sig, k_class, axes=([0], [0]),
            precision=jax.lax.Precision.HIGHEST,
        ) + fixed
        return _lowrank_core(
            K_base, k_class[lung_class], idx, mask, rhs, readout_rows
        )


@functools.partial(jax.jit, static_argnames=("lung_class", "ref_node"))
def _lowrank_setup_batch(
    k_stack, d_stack, ref_node, sigma_base, lung_class, idxs, masks,
    el_stack, ex_mat, a0s,
):
    def one(k_class, diag_fix, idx, mask, el_pos, alpha0):
        return _lowrank_setup(
            k_class, diag_fix, ref_node, sigma_base, lung_class,
            idx, mask, el_pos, ex_mat, alpha0,
        )

    return jax.vmap(one)(k_stack, d_stack, idxs, masks, el_stack, a0s)


def lowrank_solve_batch(solvers, lung_alphas):
    """Solve MANY same-bucket subjects' monitorings in ONE device program.

    Per-subject ``solver.solve`` calls pay one dispatch round-trip each —
    ~25 ms on relay-attached chips (profile_setup.py), which for 8
    subjects was costing more than the solve math itself. Stacks the
    factored operators (same shapes by construction from build_batch)
    and runs one vmapped solve. Returns a list of (T, n_exc, n_meas).
    """
    if not solvers:
        return []
    # same-bucket precondition, enforced (shape-level — an elementwise
    # compare would device-sync on the hot path): the group shares one
    # measurement operator, stacking silently used solvers[0]'s otherwise
    m0 = solvers[0].meas_mat
    for s in solvers[1:]:
        if s.meas_mat.shape != m0.shape:
            raise ValueError(
                "lowrank_solve_batch requires same-bucket solvers "
                f"(meas_mat {s.meas_mat.shape} != {m0.shape})"
            )
    s2 = jnp.stack([s.s2 for s in solvers])
    u0 = jnp.stack([s.u0 for s in solvers])
    yq = jnp.stack([s.yq for s in solvers])
    zq = jnp.stack([s.zq for s in solvers])
    a0 = jnp.asarray([s.alpha0 for s in solvers], s2.dtype)
    alphas = jnp.asarray(lung_alphas, s2.dtype)
    out = _lowrank_solve_batched(
        s2, u0, yq, zq, alphas, a0, solvers[0].meas_mat
    )
    return [out[b] for b in range(len(solvers))]


@jax.jit
def _lowrank_solve_batched(s2, u0, yq, zq, alphas, a0s, meas_mat):
    def one(s2b, u0b, yqb, zqb, a0b):
        return _lowrank_solve(s2b, u0b, yqb, zqb, alphas, a0b, meas_mat)

    return jax.vmap(one)(s2, u0, yq, zq, a0s)


@jax.jit
def _lowrank_solve(s2, u0, yq, zq, alphas, alpha0, meas_mat):
    with jax.default_matmul_precision("highest"):
        c = alphas - alpha0  # (T,)
        cs2 = c[:, None] * s2[None, :]
        f = cs2 / (1.0 + cs2)  # (T, r)
        # Measurement-folded operator (see _spectral_solve): the whole
        # monitoring is one (T, r) x (r, n_exc*n_meas) matmul plus the
        # baseline measurement broadcast — no per-frame gathers.
        n_idx = meas_mat[:, :, 0]  # (n_exc, n_meas)
        m_idx = meas_mat[:, :, 1]
        H = (zq[n_idx] - zq[m_idx]) * yq.T[:, None, :]  # (n_exc, n_meas, r)
        v0 = _measure(u0, meas_mat)  # (n_exc, n_meas)
        flat = f @ H.reshape(-1, H.shape[-1]).T  # (T, n_exc*n_meas)
        return v0[None] - flat.reshape(alphas.shape[0], *n_idx.shape)
