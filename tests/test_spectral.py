import numpy as np
import jax.numpy as jnp

from eitx.fem import ClassStiffness, create_protocol, place_electrodes_equal_spacing
from eitx.fem.solver import forward_solve_batched
from eitx.fem.spectral import SpectralEITSolver

from meshfix import disk_mesh_with_classes


def test_spectral_matches_cholesky():
    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5, dtype=jnp.float32)
    base = np.array([0.006, 0.35, 0.15, 0.017, 0.4])  # lung col = 2
    alphas = np.linspace(0.06, 0.18, 9)
    sigma = np.tile(base, (alphas.size, 1))
    sigma[:, 2] = alphas
    v_ref = np.asarray(
        forward_solve_batched(cs, jnp.asarray(sigma, jnp.float32),
                              jnp.asarray(el), jnp.asarray(p.ex_mat),
                              jnp.asarray(p.meas_mat)))
    solver = SpectralEITSolver.build(
        cs, base, lung_class=2, el_pos=el, ex_mat=p.ex_mat,
        meas_mat=p.meas_mat, alpha0=float(alphas.mean()))
    v_sp = np.asarray(solver.solve(alphas))
    assert v_sp.shape == v_ref.shape
    scale = np.abs(v_ref).max()
    err = np.abs(v_sp - v_ref).max() / scale
    assert err < 2e-3, err


def test_spectral_breathing_modulation_monotone():
    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5, dtype=jnp.float32)
    base = np.array([0.006, 0.35, 0.15, 0.017, 0.4])
    solver = SpectralEITSolver.build(cs, base, 2, el, p.ex_mat, p.meas_mat, 0.12)
    alphas = np.array([0.06, 0.12, 0.18])
    v = np.asarray(solver.solve(alphas))
    # voltages must vary smoothly and monotonically with lung conductivity
    d01 = np.abs(v[1] - v[0]).max()
    d02 = np.abs(v[2] - v[0]).max()
    assert d02 > d01 > 0


def test_build_batch_matches_per_subject():
    """Batched (vmapped) pencil setup must reproduce per-subject solvers."""
    import numpy as np
    from eitx.fem.assembly import ClassStiffness
    from eitx.fem.electrodes import place_electrodes_equal_spacing
    from eitx.fem.protocol import create_protocol
    from eitx.fem.spectral import SpectralEITSolver
    from meshfix import disk_mesh_with_classes

    proto = create_protocol(16, 1, 1, "std")
    subs = []
    for nb in (40, 48):  # two subjects, same node bucket after padding
        nodes, tris, cls = disk_mesh_with_classes(nb, 6)
        el = place_electrodes_equal_spacing(nodes, tris, 16,
                                            starting_angle=np.pi)
        cs = ClassStiffness.build(nodes, tris, cls, n_classes=5,
                                  pad_nodes_to=512, pad_elems_to=1024)
        subs.append((cs, el))
    sigma0 = np.array([0.006, 0.35, 0.15, 0.017, 0.0002])
    alphas = np.linspace(0.1, 0.2, 5)
    a0 = float(alphas.mean())

    batched = SpectralEITSolver.build_batch(
        [cs for cs, _ in subs], sigma0, 2, [el for _, el in subs],
        proto.ex_mat, proto.meas_mat, [a0, a0],
    )
    for (cs, el), bsolver in zip(subs, batched):
        single = SpectralEITSolver.build(
            cs, sigma0, 2, el, proto.ex_mat, proto.meas_mat, a0
        )
        va = np.asarray(single.solve(alphas))
        vb = np.asarray(bsolver.solve(alphas))
        assert np.allclose(va, vb, rtol=2e-4, atol=1e-7), (
            np.abs(va - vb).max()
        )


def test_lowrank_matches_full_spectral():
    """Lung-subspace Woodbury factorization == full-pencil eigh (exact
    algebra, f32 tolerance) and == the direct batched-Cholesky solver."""
    from eitx.fem.spectral import LowRankSpectralSolver

    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5, dtype=jnp.float32)
    base = np.array([0.006, 0.35, 0.15, 0.017, 0.4])
    alphas = np.linspace(0.06, 0.18, 9)
    a0 = float(alphas.mean())
    full = SpectralEITSolver.build(cs, base, 2, el, p.ex_mat, p.meas_mat, a0)
    lr = LowRankSpectralSolver.build(
        cs, base, 2, el, p.ex_mat, p.meas_mat, a0, rank_bucket=64
    )
    # the subspace must actually be smaller than the mesh
    assert lr.s2.shape[0] < cs.n_nodes
    v_full = np.asarray(full.solve(alphas))
    v_lr = np.asarray(lr.solve(alphas))
    scale = np.abs(v_full).max()
    assert np.abs(v_lr - v_full).max() / scale < 2e-4

    sigma = np.tile(base, (alphas.size, 1))
    sigma[:, 2] = alphas
    v_ref = np.asarray(
        forward_solve_batched(cs, jnp.asarray(sigma, jnp.float32),
                              jnp.asarray(el), jnp.asarray(p.ex_mat),
                              jnp.asarray(p.meas_mat)))
    assert np.abs(v_lr - v_ref).max() / np.abs(v_ref).max() < 2e-3


def test_lowrank_build_batch_matches_single():
    from eitx.fem.spectral import LowRankSpectralSolver

    proto = create_protocol(16, 1, 1, "std")
    subs = []
    for nb in (40, 48):
        nodes, tris, cls = disk_mesh_with_classes(nb, 6)
        el = place_electrodes_equal_spacing(nodes, tris, 16,
                                            starting_angle=np.pi)
        cs = ClassStiffness.build(nodes, tris, cls, n_classes=5,
                                  pad_nodes_to=512, pad_elems_to=1024)
        subs.append((cs, el))
    sigma0 = np.array([0.006, 0.35, 0.15, 0.017, 0.0002])
    alphas = np.linspace(0.1, 0.2, 5)
    a0 = float(alphas.mean())
    batched = LowRankSpectralSolver.build_batch(
        [cs for cs, _ in subs], sigma0, 2, [el for _, el in subs],
        proto.ex_mat, proto.meas_mat, [a0, a0], rank_bucket=64,
    )
    for (cs, el), bs in zip(subs, batched):
        single = LowRankSpectralSolver.build(
            cs, sigma0, 2, el, proto.ex_mat, proto.meas_mat, a0,
            rank_bucket=64,
        )
        va = np.asarray(single.solve(alphas))
        vb = np.asarray(bs.solve(alphas))
        assert np.allclose(va, vb, rtol=2e-4, atol=1e-7), (
            np.abs(va - vb).max()
        )


def test_lowrank_solve_batch_matches_per_solver():
    """The one-launch group solve is bit-comparable to per-solver calls
    (same compiled math, just vmapped over the stacked operators)."""
    from eitx.fem.spectral import LowRankSpectralSolver, lowrank_solve_batch

    proto = create_protocol(16, 1, 1, "std")
    subs = []
    for seed in (0, 1, 2):
        nodes, tris, cls = disk_mesh_with_classes(40 + seed, 5)
        el = place_electrodes_equal_spacing(nodes, tris, 16,
                                            starting_angle=np.pi)
        cs = ClassStiffness.build(nodes, tris, cls, n_classes=5,
                                  pad_nodes_to=512, pad_elems_to=1024)
        subs.append((cs, el))
    sigma0 = np.array([0.006, 0.35, 0.15, 0.017, 0.0002])
    alphas = np.linspace(0.1, 0.2, 5)
    a0 = float(alphas.mean())
    solvers = LowRankSpectralSolver.build_batch(
        [cs for cs, _ in subs], sigma0, 2, [el for _, el in subs],
        proto.ex_mat, proto.meas_mat, [a0] * 3, rank_bucket=64,
    )
    fused = lowrank_solve_batch(solvers, alphas)
    for s, vf in zip(solvers, fused):
        vs = np.asarray(s.solve(alphas))
        assert np.allclose(vs, np.asarray(vf), rtol=1e-5, atol=1e-8)


def test_lowrank_no_lung_mesh_is_constant():
    """A mesh with no lung elements: the low-rank path degrades to the
    baseline solve and breathing has no effect."""
    from eitx.fem.spectral import LowRankSpectralSolver

    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    cls = np.where(cls == 2, 1, cls)  # relabel lung -> muscles
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5)
    base = np.array([0.006, 0.35, 0.15, 0.017, 0.4])
    lr = LowRankSpectralSolver.build(
        cs, base, 2, el, p.ex_mat, p.meas_mat, 0.12, rank_bucket=64
    )
    v = np.asarray(lr.solve(np.array([0.06, 0.12, 0.18])))
    assert np.isfinite(v).all()
    assert np.abs(v[2] - v[0]).max() < 1e-6 * max(np.abs(v).max(), 1.0)
