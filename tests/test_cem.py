import numpy as np
import jax.numpy as jnp

from eitx.fem import ClassStiffness, create_protocol, place_electrodes_equal_spacing
from eitx.fem.cem import build_cem_system, electrode_arcs, forward_solve_cem
from eitx.fem.solver import forward_solve

from meshfix import disk_mesh_with_classes


def _setup():
    nodes, tris, cls = disk_mesh_with_classes(64, 6)
    cs = ClassStiffness.build(
        nodes, tris, cls, n_classes=5, dtype=jnp.float32, ground_ref=False
    )
    return nodes, tris, cls, cs


def test_electrode_arcs_cover_boundary():
    nodes, tris, _, _ = _setup()
    arcs = electrode_arcs(nodes, tris, 16, coverage=0.5)
    assert len(arcs) == 16
    for pairs, lens in arcs:
        assert pairs.shape[0] == lens.shape[0] >= 1
        # all arc nodes on the boundary circle
        r = np.linalg.norm(nodes[pairs.ravel()], axis=1)
        assert np.all(r > 0.9)
    # arcs are disjoint at 50% coverage
    all_edges = np.concatenate([np.sort(p, 1) for p, _ in arcs])
    assert len({tuple(e) for e in all_edges}) == len(all_edges)


def test_cem_reciprocity():
    nodes, tris, cls, cs = _setup()
    sys_ = build_cem_system(cs, nodes, tris, 16, z_contact=1e-2)
    p = create_protocol(16, 1, 1, "meas_current")
    sigma = np.array([[0.006, 0.35, 0.15, 0.017, 0.4]])
    v = np.asarray(forward_solve_cem(sys_, sigma, p.ex_mat, p.meas_mat))[0]
    # exact to 3e-12 in f64; f32 leaves ~1e-4 relative round-off
    asym = np.abs(v - v.T).max() / np.abs(v).max()
    assert asym < 2e-4, asym


def test_cem_close_to_point_model_for_small_z():
    nodes, tris, cls, cs_cem = _setup()
    sys_ = build_cem_system(cs_cem, nodes, tris, 16, z_contact=1e-4,
                            coverage=0.2)
    p = create_protocol(16, 1, 1, "std")
    base = np.array([0.006, 0.35, 0.15, 0.017, 0.4])
    v_cem = np.asarray(
        forward_solve_cem(sys_, base[None], p.ex_mat, p.meas_mat)
    )[0].ravel()
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    v_pt = np.asarray(
        forward_solve(
            jnp.asarray(nodes, jnp.float32), jnp.asarray(tris, jnp.int32),
            jnp.asarray(base[cls], jnp.float32), jnp.asarray(el),
            jnp.asarray(p.ex_mat), jnp.asarray(p.meas_mat), nodes.shape[0],
        )
    ).ravel()
    # finite electrodes shunt current, so the CEM legitimately deviates
    # from the point model; strong correlation is the sanity bar
    corr = np.corrcoef(v_cem, v_pt)[0, 1]
    assert corr > 0.9, corr
    # same order of magnitude (the two electrode physics genuinely differ
    # near the drive pair: point injection vs distributed contact)
    assert 0.3 < np.abs(v_cem).max() / np.abs(v_pt).max() < 3.0


def test_cem_contact_impedance_affects_drive_not_farfield():
    nodes, tris, cls, cs = _setup()
    p = create_protocol(16, 1, 1, "std")  # excludes drive electrodes
    base = np.array([[0.006, 0.35, 0.15, 0.017, 0.4]])
    v1 = np.asarray(forward_solve_cem(
        build_cem_system(cs, nodes, tris, 16, z_contact=1e-3),
        base, p.ex_mat, p.meas_mat))[0]
    v2 = np.asarray(forward_solve_cem(
        build_cem_system(cs, nodes, tris, 16, z_contact=1e-2),
        base, p.ex_mat, p.meas_mat))[0]
    # measurements that avoid current-carrying electrodes barely move
    rel = np.abs(v2 - v1).max() / np.abs(v1).max()
    assert rel < 0.05, rel


def test_cem_breathing_modulation():
    nodes, tris, cls, cs = _setup()
    sys_ = build_cem_system(cs, nodes, tris, 16)
    p = create_protocol(16, 1, 1, "std")
    base = np.array([0.006, 0.35, 0.15, 0.017, 0.4])
    sigma = np.tile(base, (3, 1))
    sigma[:, 2] = [0.06, 0.12, 0.18]
    v = np.asarray(forward_solve_cem(sys_, sigma, p.ex_mat, p.meas_mat))
    assert np.isfinite(v).all()
    d01 = np.abs(v[1] - v[0]).max()
    d02 = np.abs(v[2] - v[0]).max()
    assert d02 > d01 > 0


def test_simulate_monitoring_with_cem_electrodes():
    from eitx.core.config import SimulationConfig
    from eitx.fem import simulate_eit_monitoring

    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    mesh_data = {"NODES": nodes, "TRIANGLES": tris, "CLASS": cls}
    cfg = SimulationConfig(n_points=4, electrode_model="cem", z_contact=5e-3)
    v, dt = simulate_eit_monitoring(mesh_data, cfg)
    assert v.shape == (4, 16 * 13)
    assert np.isfinite(v).all()
    assert np.std(v, axis=0).max() > 0


def test_cem_spectral_matches_direct():
    from eitx.fem.cem import spectral_cem_solver

    nodes, tris, cls, cs = _setup()
    sys_ = build_cem_system(cs, nodes, tris, 16, z_contact=1e-2)
    p = create_protocol(16, 1, 1, "std")
    base = np.array([0.006, 0.35, 0.12, 0.017, 0.4])
    alphas = np.linspace(0.06, 0.18, 5)
    sigma = np.tile(base, (5, 1))
    sigma[:, 2] = alphas
    v_direct = np.asarray(forward_solve_cem(sys_, sigma, p.ex_mat, p.meas_mat))
    solver = spectral_cem_solver(sys_, base, 2, p.ex_mat, p.meas_mat,
                                 alpha0=float(alphas.mean()))
    v_spec = np.asarray(solver.solve(alphas))
    scale = np.abs(v_direct).max()
    err = np.abs(v_spec - v_direct).max() / scale
    assert err < 3e-3, err
