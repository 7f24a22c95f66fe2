import numpy as np
import jax.numpy as jnp
import pytest

from eitx.core.config import ClassMap, SimulationConfig
from eitx.fem import (
    ClassStiffness,
    assemble_stiffness,
    boundary_loop,
    create_protocol,
    forward_solve,
    forward_solve_batched,
    place_electrodes_equal_spacing,
    prepare_mesh_info,
    simulate_eit_monitoring,
)
from eitx.fem.oracle import assemble_sparse, forward_solve_oracle
from eitx.fem.solver import forward_solve_cg

from meshfix import disk_mesh, disk_mesh_with_classes


def test_protocol_adjacent_16():
    p = create_protocol(16, 1, 1, "std")
    assert p.ex_mat.shape == (16, 2)
    assert p.meas_mat.shape == (16, 13, 2)
    # excitation 0 injects between electrodes 0 and 1
    assert tuple(p.ex_mat[0]) == (0, 1)
    # no measurement touches a current electrode
    for e, (a, b) in enumerate(p.ex_mat):
        assert not np.isin(p.meas_mat[e], [a, b]).any()


def test_protocol_meas_current_keeps_all():
    p = create_protocol(16, 1, 1, "meas_current")
    assert p.meas_mat.shape == (16, 16, 2)


def test_assembly_matches_sparse_oracle():
    nodes, tris = disk_mesh(32, 4)
    cond = np.random.default_rng(0).uniform(0.5, 2.0, tris.shape[0])
    K_jax = np.asarray(
        assemble_stiffness(
            jnp.asarray(nodes, jnp.float32),
            jnp.asarray(tris, jnp.int32),
            jnp.asarray(cond, jnp.float32),
            nodes.shape[0],
        )
    )
    K_ref = assemble_sparse(nodes, tris, cond).toarray()
    assert np.allclose(K_jax, K_ref, rtol=1e-4, atol=1e-5)
    # stiffness matrix rows sum to ~0 (constant nullspace before grounding)
    assert np.abs(K_ref.sum(axis=1)).max() < 1e-9


def test_boundary_loop_is_circle():
    nodes, tris = disk_mesh(40, 5)
    loop = boundary_loop(tris)
    r = np.linalg.norm(nodes[loop], axis=1)
    assert np.all(r > 0.95)  # all boundary nodes on the outer ring
    assert len(loop) >= 36


def test_boundary_loop_rejects_disconnected_mesh():
    """A mesh of two disjoint fragments must raise, not silently trace
    the fragment holding the bottommost node (geometric-walk path)."""
    import pytest

    from eitx.core.errors import MeshingError

    nodes = np.array(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],       # fragment A
         [10.0, 10.0], [11.0, 10.0], [10.0, 11.0]]  # fragment B
    )
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    with pytest.raises(MeshingError, match="disconnected"):
        boundary_loop(tris, nodes)


def test_electrode_placement_spacing_and_start():
    nodes, tris = disk_mesh(64, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    assert len(set(el.tolist())) == 16
    p0 = nodes[el[0]]
    ang0 = np.arctan2(p0[1], p0[0])
    assert abs(abs(ang0) - np.pi) < 0.25  # first electrode near 180 deg
    angs = np.unwrap(np.arctan2(nodes[el][:, 1], nodes[el][:, 0]))
    gaps = np.diff(angs)
    assert np.all(np.abs(np.abs(gaps) - 2 * np.pi / 16) < 0.2)


def test_forward_solve_matches_oracle():
    nodes, tris = disk_mesh(48, 6)
    rng = np.random.default_rng(1)
    cond = rng.uniform(0.2, 1.5, tris.shape[0])
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    v = np.asarray(
        forward_solve(
            jnp.asarray(nodes, jnp.float32),
            jnp.asarray(tris, jnp.int32),
            jnp.asarray(cond, jnp.float32),
            jnp.asarray(el),
            jnp.asarray(p.ex_mat),
            jnp.asarray(p.meas_mat),
            nodes.shape[0],
        )
    )
    v_ref = forward_solve_oracle(nodes, tris, cond, el, p.ex_mat, p.meas_mat)
    scale = np.abs(v_ref).max()
    assert np.abs(v - v_ref).max() / scale < 2e-4


def test_reciprocity():
    """Drive pair (i, i+1), measure pair (j, j+1) equals the swap —
    a physical invariant independent of the oracle."""
    nodes, tris = disk_mesh(48, 6)
    cond = np.ones(tris.shape[0])
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "meas_current")
    v = np.asarray(
        forward_solve(
            jnp.asarray(nodes, jnp.float32),
            jnp.asarray(tris, jnp.int32),
            jnp.asarray(cond, jnp.float32),
            jnp.asarray(el),
            jnp.asarray(p.ex_mat),
            jnp.asarray(p.meas_mat),
            nodes.shape[0],
        )
    )
    # v[e, m] with meas (n=m+1, m): drive (e,e+1) measure (m+1,m).
    # Reciprocity: v[e, m] == v[m, e] (up to sign conventions both identical
    # here since patterns are symmetric).
    for e in range(16):
        for m in range(16):
            assert np.isclose(v[e, m], v[m, e], rtol=1e-3, atol=1e-6)


def test_batched_solver_matches_single_and_oracle():
    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5, dtype=jnp.float32)
    T = 7
    rng = np.random.default_rng(2)
    sigma = rng.uniform(0.05, 1.0, (T, 5))
    v_b = np.asarray(
        forward_solve_batched(
            cs,
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(el),
            jnp.asarray(p.ex_mat),
            jnp.asarray(p.meas_mat),
        )
    )
    assert v_b.shape == (T, 16, 13)
    for t in range(0, T, 3):
        cond = sigma[t][cls]
        v_ref = forward_solve_oracle(nodes, tris, cond, el, p.ex_mat, p.meas_mat)
        scale = np.abs(v_ref).max()
        # f32 batched Cholesky vs f64 sparse LU: a few 1e-3 relative is the
        # expected floor for these condition numbers.
        assert np.abs(v_b[t] - v_ref).max() / scale < 5e-3, t


def test_cg_solver_agrees_with_cholesky():
    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    cs = ClassStiffness.build(nodes, tris, cls, n_classes=5, dtype=jnp.float32)
    sigma = np.array([[0.006, 0.35, 0.1, 0.04, 0.4]])
    v_chol = np.asarray(
        forward_solve_batched(cs, jnp.asarray(sigma, jnp.float32),
                              jnp.asarray(el), jnp.asarray(p.ex_mat),
                              jnp.asarray(p.meas_mat)))
    v_cg = np.asarray(
        forward_solve_cg(cs, jnp.asarray(sigma, jnp.float32),
                         jnp.asarray(el), jnp.asarray(p.ex_mat),
                         jnp.asarray(p.meas_mat), tol=1e-9, maxiter=3000))
    scale = np.abs(v_chol).max()
    assert np.abs(v_chol - v_cg).max() / scale < 5e-3


def test_simulate_eit_monitoring_end_to_end(tmp_path):
    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    mesh_data = {
        "NODES": nodes.tolist(),
        "TRIANGLES": tris.tolist(),
        "CLASS": cls.tolist(),
    }
    cfg = SimulationConfig(n_points=10, n_spir=12, n_electrodes=16)
    out = tmp_path / "res.dat"
    v, dt = simulate_eit_monitoring(
        mesh_data, cfg, save_to_file=True, filename=str(out)
    )
    assert v.shape == (10, 16 * 13)
    assert np.isfinite(v).all()
    assert dt > 0
    rows = out.read_text().strip().split("\n")
    assert len(rows) == 10 * 12  # frames x n_spir*n_minutes repeats
    assert len(rows[0].split()) == 208
    # breathing modulates the signal
    assert np.std(v, axis=0).max() > 0


def test_prepare_mesh_info_groups_classes():
    nodes, tris, cls = disk_mesh_with_classes(32, 4)
    info = prepare_mesh_info(
        {"NODES": nodes, "TRIANGLES": tris, "CLASS": cls}, ClassMap()
    )
    total = sum(len(v) for v in info.classes_gr.values())
    assert total == tris.shape[0]
    assert len(info.classes_gr["lung"]) > 0
    assert len(info.classes_gr["muscles"]) > 0


def test_determinism():
    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    mesh_data = {"NODES": nodes, "TRIANGLES": tris, "CLASS": cls}
    cfg = SimulationConfig(n_points=4)
    v1, _ = simulate_eit_monitoring(mesh_data, cfg)
    v2, _ = simulate_eit_monitoring(mesh_data, cfg)
    assert np.array_equal(v1, v2)
