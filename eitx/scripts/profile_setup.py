"""Stage-by-stage wall-clock profile of the low-rank spectral EIT setup.

Round 3 measured the per-subject setup at ~56 ms / 1.4% MFU and showed
vmapping it over 8 subjects gains only 4% — so SOMETHING in the setup
serializes. This script times every stage of ``_lowrank_setup`` as its
own compiled program (single subject and vmapped batch of 8) so the
dominant stage is named by measurement instead of guessed at
(round-3 verdict hypothesized the dense (C, N, N) HBM read; the round-2
fix assumed the Cholesky; the verdict's own alternative suspect is the
r x r eighs).

Usage: python -m eitx.scripts.profile_setup [--batch 8] [--repeats 5]
Prints one JSON dict of stage -> {single_ms, batch_ms, batch_per_subject_ms}.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _timeit(fn, *args, repeats=5):
    """Median wall ms of a jitted fn (compile excluded)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--report", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import build_thorax_mesh
    from eitx.core.cache import enable_compilation_cache
    from eitx.core.config import ClassMap
    from eitx.fem.assembly import ClassStiffness
    from eitx.fem.electrodes import place_electrodes_equal_spacing
    from eitx.fem.forward import (
        build_sigma_frames,
        compact_mesh_nodes,
        prepare_mesh_info,
    )
    from eitx.fem.protocol import create_protocol
    from eitx.fem.solver import _rhs_matrix
    from eitx.fem.spectral import _lung_subspace_indices
    from eitx.physio.materials import (
        generate_material_tables,
        tissue_conductivities,
    )
    from eitx.physio.spirometry import conductivity_schedule

    enable_compilation_cache()
    B = args.batch
    meshes = [build_thorax_mesh(lc=7.0, jitter=0.03, seed=s)
              for s in range(B)]
    classes = ClassMap()
    mats = generate_material_tables()
    _, condspir = conductivity_schedule(12, 100, 5e4, mats)
    base = tissue_conductivities(mats, 5e4, classes.id_to_name())
    sigma = build_sigma_frames(condspir, base, classes)
    lung = classes.name_to_id()["lung"]
    a0 = float(np.mean(sigma[:, lung]))
    proto = create_protocol(16, 1, 1, "std")
    infos = [compact_mesh_nodes(prepare_mesh_info(m, classes))
             for m in meshes]
    els = [place_electrodes_equal_spacing(i.node, i.element, 16,
                                          starting_angle=np.pi)
           for i in infos]
    css = [ClassStiffness.build(i.node, i.element, i.cond, n_classes=5,
                                pad_nodes_to=512, pad_elems_to=2048)
           for i in infos]
    cs = css[0]
    n = cs.n_nodes
    dtype = cs.k_class.dtype
    sig0 = jnp.asarray(sigma[0], dtype)

    pairs = [_lung_subspace_indices(c, lung, 256) for c in css]
    r = max(p0[0].shape[0] for p0 in pairs)
    idxs = np.stack([np.pad(p0[0], (0, r - p0[0].shape[0]))
                     for p0 in pairs])
    masks = np.stack([np.pad(p0[1], (0, r - p0[1].shape[0]))
                      for p0 in pairs])
    idx = jnp.asarray(idxs[0])
    mask = jnp.asarray(masks[0], dtype)
    el = jnp.asarray(els[0])
    ex = jnp.asarray(proto.ex_mat)

    # ---- staged single-subject programs --------------------------------
    @jax.jit
    def s0_kbase(k_class, diag_fix, sig):
        with jax.default_matmul_precision("highest"):
            return jnp.tensordot(
                sig.at[lung].set(jnp.asarray(a0, dtype)), k_class,
                axes=([0], [0]), precision=jax.lax.Precision.HIGHEST,
            ) + jnp.diag(diag_fix)

    K_base = s0_kbase(cs.k_class, cs.diag_fix, sig0)
    Kl = cs.k_class[lung]

    @jax.jit
    def s1_chol(K):
        return jnp.linalg.cholesky(K)

    L = s1_chol(K_base)

    @jax.jit
    def s2_kls(Kl_, idx_, mask_):
        Kl_s = Kl_[idx_][:, idx_] * (mask_[:, None] * mask_[None, :])
        return Kl_s

    Kl_s = s2_kls(Kl, idx, mask)

    @jax.jit
    def s3_eigh_r(A):
        return jnp.linalg.eigh(A)

    lamS, Vs = s3_eigh_r(Kl_s)

    @jax.jit
    def s4_scatter_SR(Vs_, lamS_, idx_, mask_):
        R = Vs_ * jnp.sqrt(jnp.clip(lamS_, 0.0))[None, :]
        return jnp.zeros((n, r), dtype).at[idx_].add(R * mask_[:, None])

    SR = s4_scatter_SR(Vs, lamS, idx, mask)

    @jax.jit
    def s5_trisolve_L(L_, SR_):
        import jax.scipy.linalg as jsl
        return jsl.solve_triangular(L_, SR_, lower=True)

    U = s5_trisolve_L(L, SR)

    @jax.jit
    def s6_gram(U_):
        with jax.default_matmul_precision("highest"):
            M = U_.T @ U_
            return 0.5 * (M + M.T)

    M = s6_gram(U)
    s2v, Vu = s3_eigh_r(M)

    @jax.jit
    def s7_q(U_, Vu_, s2_):
        eps = jnp.maximum(s2_.max(), 0.0) * 1e-7
        live = s2_ > eps
        qs = jnp.where(live, jax.lax.rsqrt(jnp.maximum(s2_, eps)), 0.0)
        return U_ @ (Vu_ * qs[None, :])

    Q = s7_q(U, Vu, s2v)
    Brhs = _rhs_matrix(el, ex, n, dtype).at[cs.ref_node, :].set(0.0)

    @jax.jit
    def s8_rhs_chain(L_, Q_, Brhs_):
        import jax.scipy.linalg as jsl
        C0 = jsl.solve_triangular(L_, Brhs_, lower=True)
        u0 = jsl.solve_triangular(L_.T, C0, lower=False)[el]
        yq = Q_.T @ C0
        zq = jsl.solve_triangular(L_.T, Q_, lower=False)[el]
        return u0, yq, zq

    stages = {
        "s0_kbase_tensordot": (s0_kbase, (cs.k_class, cs.diag_fix, sig0)),
        "s1_cholesky_N": (s1_chol, (K_base,)),
        "s2_lung_block_gather": (s2_kls, (Kl, idx, mask)),
        "s3_eigh_r_Kls": (s3_eigh_r, (Kl_s,)),
        "s4_scatter_SR": (s4_scatter_SR, (Vs, lamS, idx, mask)),
        "s5_trisolve_N_r": (s5_trisolve_L, (L, SR)),
        "s6_gram_UtU": (s6_gram, (U,)),
        "s3b_eigh_r_M": (s3_eigh_r, (M,)),
        "s7_form_Q": (s7_q, (U, Vu, s2v)),
        "s8_rhs_chain": (s8_rhs_chain, (L, Q, Brhs)),
    }

    out = {"n_nodes_padded": int(n), "rank": int(r), "batch": B}
    for name, (fn, a) in stages.items():
        out[name] = {"single_ms": round(_timeit(fn, *a,
                                                repeats=args.repeats), 3)}
        print(json.dumps({name: out[name]}), flush=True)

    # ---- batched variants ---------------------------------------------
    k_stack = jnp.stack([c.k_class for c in css])
    d_stack = jnp.stack([c.diag_fix for c in css])
    el_stack = jnp.asarray(np.stack([np.asarray(e) for e in els]))
    idx_b = jnp.asarray(idxs)
    mask_b = jnp.asarray(masks, dtype)
    sig_b = jnp.broadcast_to(sig0, (B,) + sig0.shape)

    Kb_b = jax.vmap(s0_kbase)(k_stack, d_stack, sig_b)
    L_b = jax.jit(jax.vmap(jnp.linalg.cholesky))(Kb_b)
    Kl_b = k_stack[:, lung]
    Kls_b = jax.vmap(s2_kls)(Kl_b, idx_b, mask_b)
    eigh_b = jax.jit(jax.vmap(jnp.linalg.eigh))
    lamS_b, Vs_b = eigh_b(Kls_b)
    SR_b = jax.vmap(s4_scatter_SR)(Vs_b, lamS_b, idx_b, mask_b)
    tris_b = jax.jit(jax.vmap(
        lambda Lx, Sx: jax.scipy.linalg.solve_triangular(Lx, Sx, lower=True)
    ))
    U_b = tris_b(L_b, SR_b)
    gram_b = jax.jit(jax.vmap(lambda Ux: 0.5 * (Ux.T @ Ux + (Ux.T @ Ux).T)))
    M_b = gram_b(U_b)

    batched = {
        "s0_kbase_tensordot": (jax.jit(jax.vmap(s0_kbase)),
                               (k_stack, d_stack, sig_b)),
        "s1_cholesky_N": (jax.jit(jax.vmap(jnp.linalg.cholesky)), (Kb_b,)),
        "s2_lung_block_gather": (jax.jit(jax.vmap(s2_kls)),
                                 (Kl_b, idx_b, mask_b)),
        "s3_eigh_r_Kls": (eigh_b, (Kls_b,)),
        "s4_scatter_SR": (jax.jit(jax.vmap(s4_scatter_SR)),
                          (Vs_b, lamS_b, idx_b, mask_b)),
        "s5_trisolve_N_r": (tris_b, (L_b, SR_b)),
        "s6_gram_UtU": (gram_b, (U_b,)),
        "s3b_eigh_r_M": (eigh_b, (M_b,)),
    }
    for name, (fn, a) in batched.items():
        ms = _timeit(fn, *a, repeats=args.repeats)
        out[name]["batch_ms"] = round(ms, 3)
        out[name]["batch_per_subject_ms"] = round(ms / B, 3)
        print(json.dumps({name + "_batch": out[name]}), flush=True)

    print(json.dumps(out, indent=1))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
