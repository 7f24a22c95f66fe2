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
