import json

import numpy as np
import jax.numpy as jnp
import pytest

from eitx.fem.admittance import forward_solve_admittance
from eitx.fem.femm_model import (
    CLASSES_LIST,
    Settings,
    add_skin_radial,
    export_femm_model,
    get_electrodes_coords,
    insert_electrodes_to_polygon,
    load_yolo,
    prepare_data,
)
from eitx.fem import create_protocol, place_electrodes_equal_spacing
from eitx.fem.solver import forward_solve

from meshfix import disk_mesh


def _circle(r=100.0, n=120, cx=0.0, cy=0.0):
    # start at the leftmost point, clockwise in y-down coords — the
    # ordering image-traced contours actually have
    th = np.pi - np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1)


def test_load_yolo(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text(
        "1 0 0 10 0 10 10 0 10\n"
        "3 1 1 2 2 2 2 3 3\n"  # has a duplicate point
        "0 5 5 6 6\n"  # too short -> dropped
    )
    borders = load_yolo(str(p), CLASSES_LIST)
    assert "muscles" in borders and borders["muscles"][0].shape == (4, 2)
    assert "fat" in borders and borders["fat"][0].shape == (3, 2)
    assert "bone" not in borders
    p2 = tmp_path / "bad.txt"
    p2.write_text("9 0 0 1 1 2 2\n")
    with pytest.raises(ValueError):
        load_yolo(str(p2), CLASSES_LIST)


def test_add_skin_radial():
    c = _circle(100.0)
    out = add_skin_radial(c, 5.0)
    r = np.linalg.norm(out, axis=1)
    assert np.allclose(r, 105.0, atol=1e-6)


def test_get_electrodes_coords_spacing():
    c = _circle(100.0, 240)
    elecs = get_electrodes_coords(c, 16, 5.0)
    assert elecs.shape == (16, 3, 2)
    centers = elecs[:, 2, :]
    r = np.linalg.norm(centers, axis=1)
    assert np.all(np.abs(r - 100.0) < 3.0)
    ang = np.sort(np.arctan2(centers[:, 1], centers[:, 0]))
    gaps = np.diff(ang)
    assert np.all(np.abs(gaps - 2 * np.pi / 16) < 0.15)
    # electrode width ~ 2 * Relec
    widths = np.linalg.norm(elecs[:, 0] - elecs[:, 1], axis=1)
    assert np.allclose(widths, 10.0, atol=1.0)


def test_insert_electrodes():
    c = _circle(100.0, 120)
    elecs = get_electrodes_coords(c, 8, 6.0)
    out = insert_electrodes_to_polygon(c, elecs)
    # edge points are in the polygon now
    for i in range(8):
        for j in range(2):
            d = np.linalg.norm(out - elecs[i, j], axis=1).min()
            assert d < 1e-9


def test_prepare_data_and_export(tmp_path):
    c = _circle(100.0, 200, cx=30, cy=-20)
    lung = _circle(25.0, 60, cx=0, cy=-20)
    borders = {"muscles": [c + np.array([30, -20]) * 0], "lung": [lung]}
    borders["muscles"] = [c]
    settings = Settings(Nelec=16, Relec=5, accuracy=0.5, min_area=100,
                        polydeg=5, skinthick=2, I=0.005, Freq=50000,
                        thin_coeff=2)
    bordersf, elecs = prepare_data(borders, settings)
    assert "skin" in bordersf
    assert elecs.shape[0] == 16
    # the legacy polynomial chain can extrapolate wildly on synthetic
    # input (degree-10 fits, reference filters.py:284) — check structure
    # and robust centering (median) rather than the mean
    main = bordersf["muscles"]["coords"][0]
    assert np.isfinite(main).all()
    assert np.abs(np.median(main, axis=0)).max() < 30
    out = tmp_path / "model.json"
    export_femm_model(str(out), bordersf, elecs, settings,
                      {"muscles": {"cond": 0.35, "perm": 1e4}})
    doc = json.loads(out.read_text())
    assert doc["problem"]["n_electrodes"] == 16
    assert "skin" in doc["contours"]
    assert len(doc["electrodes"]) == 16


def test_admittance_reduces_to_real_solver():
    nodes, tris = disk_mesh(40, 5)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    sigma = np.full(tris.shape[0], 0.3)
    # eps -> 0: complex solution equals the real solver
    v_c = np.asarray(forward_solve_admittance(
        jnp.asarray(nodes, jnp.float32), jnp.asarray(tris, jnp.int32),
        jnp.asarray(sigma, jnp.float32), jnp.zeros(tris.shape[0], jnp.float32),
        jnp.float32(5e4), jnp.asarray(el), jnp.asarray(p.ex_mat),
        jnp.asarray(p.meas_mat), nodes.shape[0]))
    v_r = np.asarray(forward_solve(
        jnp.asarray(nodes, jnp.float32), jnp.asarray(tris, jnp.int32),
        jnp.asarray(sigma, jnp.float32), jnp.asarray(el),
        jnp.asarray(p.ex_mat), jnp.asarray(p.meas_mat), nodes.shape[0]))
    assert np.abs(v_c.imag).max() < 1e-5
    assert np.abs(v_c.real - v_r).max() / np.abs(v_r).max() < 1e-3


def test_admittance_phase_appears_with_permittivity():
    nodes, tris = disk_mesh(40, 5)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    p = create_protocol(16, 1, 1, "std")
    sigma = np.full(tris.shape[0], 0.1)
    eps_r = np.full(tris.shape[0], 3e4)  # tissue-scale permittivity
    v = np.asarray(forward_solve_admittance(
        jnp.asarray(nodes, jnp.float32), jnp.asarray(tris, jnp.int32),
        jnp.asarray(sigma, jnp.float32), jnp.asarray(eps_r, jnp.float32),
        jnp.float32(5e4), jnp.asarray(el), jnp.asarray(p.ex_mat),
        jnp.asarray(p.meas_mat), nodes.shape[0]))
    # capacitive path shifts phase: imaginary part must be non-negligible
    assert np.abs(v.imag).max() > 1e-4 * np.abs(v.real).max()
    assert np.isfinite(v).all()


# --- Sheffield line-integral measurement path (round-2) ------------------

from eitx.fem.oracle import forward_solve_oracle  # noqa: E402
from eitx.fem.sheffield import (  # noqa: E402
    abs_to_diff,
    electrode_averaging_matrix,
    sheffield_ex_mat,
    sheffield_monitoring,
    sheffield_solve_admittance,
)
from meshfix import disk_mesh_with_classes  # noqa: E402


def test_abs_to_diff_reference_semantics():
    """Golden: dv[i] = v[i]-v[i+1], block-last wraps to block-first
    (synthetic_datasets_generator.py:144-162)."""
    n = 4
    v = np.array([10.0, 7.0, 5.0, 2.0, 1.0, 4.0, 9.0, 3.0])
    want = np.array([3.0, 2.0, 3.0, 2.0 - 10.0, -3.0, -5.0, 6.0, 3.0 - 1.0])
    assert np.allclose(abs_to_diff(v, n), want)
    # multi-slice form: same per-row
    vv = np.stack([v, v * 2])
    assert np.allclose(abs_to_diff(vv, n), np.stack([want, want * 2]))


def test_sheffield_ex_mat():
    ex = sheffield_ex_mat(4)
    assert ex.tolist() == [[1, 0], [2, 1], [3, 2], [0, 3]]


def test_line_integral_voltages_vs_oracle():
    """Tiny electrodes centered on boundary nodes reduce the averaging
    matrix to point measurement; the line-integral path must then match
    the float64 scipy oracle's potentials projection-for-projection."""
    nodes, tris = disk_mesh(48, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    # flat "electrodes" degenerate to the electrode node (width ~ 0)
    eps = 1e-9
    elecs = np.stack(
        [np.stack([nodes[e] - eps, nodes[e] + eps, nodes[e]]) for e in el]
    )
    W = electrode_averaging_matrix(nodes, tris, elecs, samples=3)
    # each row must be (near) one-hot at the electrode node
    assert np.allclose(W[np.arange(16), el], 1.0, atol=1e-6)

    current = 0.005
    v_abs = np.asarray(sheffield_solve_admittance(
        jnp.asarray(nodes, jnp.float32), jnp.asarray(tris, jnp.int32),
        jnp.full(tris.shape[0], 0.3, jnp.float32),
        jnp.zeros(tris.shape[0], jnp.float32), jnp.float32(5e4),
        jnp.asarray(W, jnp.float32), jnp.float32(current), nodes.shape[0]))
    v_diff = abs_to_diff(v_abs, 16)

    # oracle with the same drive pairs and all-16 neighbour measurements
    ex = sheffield_ex_mat(16)
    meas = np.stack(
        [np.stack([np.arange(16), (np.arange(16) + 1) % 16], 1)] * 16
    )
    v_oracle = forward_solve_oracle(
        nodes, tris, np.full(tris.shape[0], 0.3), el, ex, meas
    ) * current  # oracle injects unit current
    rel = np.abs(v_diff - v_oracle).max() / np.abs(v_oracle).max()
    assert rel < 2e-3, rel


def test_sheffield_monitoring_shapes_and_breathing():
    nodes, tris, cls = disk_mesh_with_classes(48, 6)
    el = place_electrodes_equal_spacing(nodes, tris, 16, starting_angle=np.pi)
    # real flat electrodes along the hull
    th = np.arctan2(nodes[el][:, 1], nodes[el][:, 0])
    tang = np.stack([-np.sin(th), np.cos(th)], 1) * 0.04
    elecs = np.stack(
        [np.stack([nodes[e] - t, nodes[e] + t, nodes[e]])
         for e, t in zip(el, tang)]
    )
    T = 3
    sig = np.full((T, tris.shape[0]), 0.3)
    for t in range(T):
        sig[t, cls == 2] = 0.10 + 0.05 * t  # breathing lungs
    eps = np.zeros_like(sig)
    v = sheffield_monitoring(nodes, tris, sig, eps, 5e4, elecs)
    assert v.shape == (T, 16, 16)
    assert np.isfinite(v).all()
    # lung conductivity change must modulate the measurements
    assert np.abs(v[2] - v[0]).max() > 1e-8
    # row sums of abs_to_diff vanish identically (telescoping)
    assert np.allclose(v.sum(axis=-1), 0.0, atol=1e-5)


def test_fec_save_and_roundtrip(tmp_path):
    from eitx.fem.femm_model import load_fec, save_model

    c = _circle(100.0, 200)
    borders = {"muscles": [c], "lung": [_circle(25.0, 60, cx=-30)]}
    settings = Settings(Nelec=16, Relec=5, accuracy=0.5, min_area=100,
                        polydeg=5, skinthick=2, I=0.005, Freq=50000,
                        thin_coeff=2)
    bordersf, elecs = prepare_data(borders, settings)
    mats = {"muscles": {"cond": 0.35, "perm": 1e4},
            "lung": {"cond": 0.15, "perm": 2e4},
            "skin": {"cond": 0.0002, "perm": 1e3}}
    paths = save_model("prob", bordersf, elecs, settings, mats,
                       n_projections=16, dirpath=str(tmp_path))
    assert len(paths) == 16
    assert paths[3].endswith("prob3.fec")
    doc = load_fec(paths[3])
    assert doc["problem"]["Frequency"] == 50000
    assert doc["materials"]["lung"]["ox"] == pytest.approx(0.15)
    # projection 3: GND at 3, INJ at 4
    assert doc["conductors"]["GND"]["Electrode"] == 3
    assert doc["conductors"]["INJ"]["Electrode"] == 4
    assert doc["conductors"]["INJ"]["Totalamps_re"] == pytest.approx(0.005)
    # wraparound projection: INJ goes back to 0
    last = load_fec(paths[15])
    assert last["conductors"]["INJ"]["Electrode"] == 0
    np.testing.assert_allclose(doc["electrodes"], elecs, rtol=1e-12)
    n_pts = sum(len(i["coords"][k]) for i in bordersf.values()
                for k in range(len(i["coords"])))
    assert len(doc["points"]) == n_pts
    assert len(doc["segments"]) == n_pts
    assert len(doc["labels"]) == sum(
        len(i["coords"]) for i in bordersf.values()
    )


def test_eit_spectroscopy_sweep():
    """Multi-frequency sweep: finite complex voltages; conductivity
    dispersion moves the real part with frequency and permittivity gives a
    nonzero phase."""
    from eitx.fem import simulate_eit_spectroscopy

    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    mesh = {"NODES": nodes * 100.0, "TRIANGLES": tris, "CLASS": cls}
    freqs = [1e4, 5e4, 2e5]
    v = simulate_eit_spectroscopy(mesh, freqs)
    assert v.shape[0] == 3 and v.shape[1] == 16
    assert np.isfinite(v.real).all() and np.isfinite(v.imag).all()
    # tissue dispersion: magnitude changes across the sweep
    assert np.abs(np.abs(v[0]) - np.abs(v[2])).max() > 0
    # capacitive phase present somewhere
    assert np.abs(v.imag).max() > 0
