"""Flagship E2E golden on the reference's embedded PATIENT-DERIVED slice.

The reference embeds one real segmented-slice polygon set as its de-facto
end-to-end test (femm_generator.py:748-829 test_module) and a matching
16-electrode coordinate fixture (synthetic_datasets_generator.py:349-397).
Both are lifted verbatim into tests/data/. These tests run the fixture
through the whole eitx chain — contours -> mesh -> element classification
-> electrode placement -> spectral forward solve — and pin mesh goldens
plus float64-oracle voltage rows: the first parity evidence on
patient-derived geometry rather than synthetic disks.

The geometry is adversarial in ways synthetic fixtures are not: the
triangulation has a pinch (bowtie) boundary node, exercising the
geometric outer-face boundary walk (fem/electrodes.py).
"""

import collections
import math
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

# Goldens computed with this repo at lc=10 (deterministic Bowyer-Watson);
# voltage rows from the float64 scipy sparse-LU oracle.
GOLD_NODES = 2107
GOLD_TRIS = 4041
GOLD_HIST = {0: 243, 1: 563, 2: 1669, 3: 1565, 4: 1}
GOLD_ROW0 = np.array(
    [3.27767618, 0.16383494, 0.15325824, 0.12928992, 0.03966795, 0.02340173]
)
GOLD_ROW5 = np.array(
    [0.07548676, 0.08194821, 0.05308934, 0.31663108, 1.00702802, 3.41541427]
)
GOLD_SUM = 1194.555605
GOLD_ABSMAX = 8.415208


def _polygons():
    with open(os.path.join(DATA, "real_slice_polygons.txt")) as fh:
        return [
            ln.strip()
            for ln in fh
            if ln.strip() and not ln.startswith("#")
        ]


@pytest.fixture(scope="module")
def real_mesh():
    from eitx.mesh.api import create_mesh

    _, mesh = create_mesh(
        ["1", "1"], _polygons(), 10, 1.3, 1, True,
        show_meshing_result_method="no",
    )
    return mesh


def test_real_slice_mesh_goldens(real_mesh):
    nodes = np.asarray(real_mesh["NODES"])
    tris = np.asarray(real_mesh["TRIANGLES"])
    cls = np.asarray(real_mesh["CLASS"])
    assert nodes.shape == (GOLD_NODES, 2)
    assert tris.shape == (GOLD_TRIS, 3)
    hist = dict(sorted(collections.Counter(cls.tolist()).items()))
    assert hist == GOLD_HIST


def test_real_slice_boundary_has_pinch_and_walks(real_mesh):
    """The patient mesh boundary is non-manifold (pinch node); the
    geometric walk must still produce a closed outer loop usable for
    electrode placement."""
    from eitx.core.errors import MeshingError
    from eitx.fem.electrodes import boundary_loop

    nodes = np.asarray(real_mesh["NODES"], np.float64)
    tris = np.asarray(real_mesh["TRIANGLES"])
    with pytest.raises(MeshingError):
        boundary_loop(tris)  # strict manifold mode must refuse
    loop = boundary_loop(tris, nodes)
    assert loop.shape[0] > 64
    # closed loop of boundary edges: consecutive points are distinct
    assert (loop[:-1] != loop[1:]).all()
    # the loop is the OUTER boundary: its bbox spans the node cloud
    pts = nodes[loop]
    assert np.allclose(pts.min(0), nodes.min(0), atol=1e-9)
    assert np.allclose(pts.max(0), nodes.max(0), atol=1e-9)


def test_real_slice_forward_solve_vs_oracle(real_mesh):
    """Spectral low-rank solve matches the float64 oracle on the real
    geometry, and the oracle rows match pinned goldens."""
    import jax.numpy as jnp  # noqa: F401  (backend init via conftest)

    from eitx.core.config import ClassMap, SimulationConfig
    from eitx.fem import create_protocol, place_electrodes_equal_spacing
    from eitx.fem.forward import (
        _breathing_schedule,
        build_sigma_frames,
        compact_mesh_nodes,
        prepare_mesh_info,
        simulate_eit_monitoring_subjects,
    )
    from eitx.fem.oracle import monitoring_oracle
    from eitx.physio.materials import get_materials, tissue_conductivities

    cfg = SimulationConfig(n_points=8, n_spir=1, n_minutes=1)
    (v, _), = simulate_eit_monitoring_subjects([real_mesh], cfg)
    assert v.shape == (8, 208)
    assert np.isfinite(v).all()
    assert v.std(axis=0).mean() > 0  # breathing modulation

    classes = ClassMap()
    info = compact_mesh_nodes(prepare_mesh_info(real_mesh, classes))
    materials = get_materials(None)
    _, condspir = _breathing_schedule(cfg, materials, False)
    base = tissue_conductivities(
        materials, cfg.frequency_hz, classes.id_to_name(), False
    )
    sigma = build_sigma_frames(condspir, base, classes)
    proto = create_protocol(
        cfg.n_electrodes, cfg.dist_exc, cfg.step_meas, cfg.parser_meas
    )
    el = place_electrodes_equal_spacing(
        info.node, info.element, n_electrodes=cfg.n_electrodes,
        starting_angle=math.radians(cfg.starting_angle_deg),
    )
    vo = np.asarray(
        monitoring_oracle(
            info.node, info.element, sigma[:, info.cond], el,
            proto.ex_mat, proto.meas_mat,
        )
    ).reshape(8, -1)
    rel = np.abs(v - vo) / (np.abs(vo) + 1e-9)
    assert rel.max() < 2e-2 and rel.mean() < 2e-3
    assert np.allclose(vo[0][:6], GOLD_ROW0, rtol=2e-4)
    assert np.allclose(vo[5][-6:], GOLD_ROW5, rtol=2e-4)
    assert abs(vo.sum() - GOLD_SUM) / GOLD_SUM < 2e-4
    assert abs(np.abs(vo).max() - GOLD_ABSMAX) / GOLD_ABSMAX < 2e-4


def test_real_slice_femm_model_chain(tmp_path):
    """Legacy FEMM-path model prep on the patient slice: filter, center,
    smooth, skin, electrode triplets — and the electrode constructor's
    output follows the SAME geometric conventions as the reference's
    recorded electrode fixture (synthetic_datasets_generator.py:349-397):
    flat electrodes of width 2*Relec with the centre point pushed
    radially outward by Relec."""
    import json

    from eitx.fem.femm_model import Settings, prepare_data

    borders = {}
    for line in _polygons():
        parts = line.split(" ")
        tissue = {"0": "bone", "1": "muscles", "2": "lung", "3": "fat",
                  "4": "skin"}[parts[0]]
        pts = np.array([float(v) for v in parts[1:]]).reshape(-1, 2)
        keep = np.ones(pts.shape[0], bool)
        keep[1:] = np.any(pts[1:] != pts[:-1], axis=1)
        pts = pts[keep]
        if pts.shape[0] >= 3:
            borders.setdefault(tissue, []).append(pts)
    settings = Settings(Nelec=16, Relec=10, accuracy=0.5, min_area=100,
                        polydeg=5, skinthick=1, I=0.005, Freq=50000,
                        thin_coeff=5)
    bordersf, elecs = prepare_data(borders, settings)
    assert elecs.shape == (16, 3, 2)
    assert "skin" in bordersf and bordersf["skin"]["coords"]

    def electrode_stats(e):
        width = np.linalg.norm(e[:, 0] - e[:, 1], axis=1)
        mid = (e[:, 0] + e[:, 1]) / 2
        bulge = np.linalg.norm(e[:, 2] - mid, axis=1)
        return width, bulge

    w_ours, b_ours = electrode_stats(elecs)
    assert np.allclose(w_ours, 2 * settings.Relec, rtol=2e-2)
    assert np.allclose(b_ours, settings.Relec, rtol=0.25)

    with open(os.path.join(DATA, "real_slice_electrodes.json")) as fh:
        rec = np.asarray(json.load(fh)["electrodes"])
    assert rec.shape == (16, 3, 2)
    w_ref, b_ref = electrode_stats(rec)
    # the recorded reference output obeys the same conventions our
    # constructor produces — cross-validation of the translation
    assert np.allclose(w_ref, 2 * settings.Relec, rtol=2e-2)
    assert np.allclose(b_ref, settings.Relec, rtol=0.25)


def test_recorded_electrodes_drive_sheffield_averaging():
    """The reference-produced electrode triplets are directly consumable
    by the Sheffield line-integral averaging-matrix builder on a mesh
    covering their coordinate range."""
    from eitx.fem.sheffield import electrode_averaging_matrix
    import json

    with open(os.path.join(DATA, "real_slice_electrodes.json")) as fh:
        rec = np.asarray(json.load(fh)["electrodes"])
    # a coarse disk mesh big enough to contain the electrode ring
    from meshfix import disk_mesh_with_classes

    nodes, tris, _ = disk_mesh_with_classes(24, 6)
    r = np.abs(rec[:, 2]).max() * 1.1
    nodes = nodes / np.abs(nodes).max() * r
    W = electrode_averaging_matrix(nodes, tris, rec, samples=9)
    assert W.shape == (16, nodes.shape[0])
    assert np.allclose(W.sum(axis=1), 1.0, atol=1e-9)
    assert (W >= 0).all()


def test_real_slice_greit_images_lungs(real_mesh):
    """GREIT on the patient-derived geometry: train the linear matrix on
    the real mesh, image a simulated breathing run, and check the lung
    pixels modulate more than the rest of the body."""
    from eitx.core.config import SimulationConfig
    from eitx.fem import greit_monitoring, simulate_eit_monitoring

    cfg = SimulationConfig(n_points=8, n_spir=1, n_minutes=1)
    v, _ = simulate_eit_monitoring(real_mesh, cfg)
    imgs, im = greit_monitoring(real_mesh, v, cfg=cfg)
    assert imgs.shape == (8, 32, 32) and np.isfinite(imgs).all()
    nodes = np.asarray(real_mesh["NODES"], np.float64)
    tris = np.asarray(real_mesh["TRIANGLES"])
    cls = np.asarray(real_mesh["CLASS"])
    cent = nodes[tris].mean(axis=1)
    xmin, xmax, ymin, ymax = im.extent
    ix = np.clip(((cent[:, 0] - xmin) / (xmax - xmin) * 32).astype(int), 0, 31)
    iy = np.clip(((cent[:, 1] - ymin) / (ymax - ymin) * 32).astype(int), 0, 31)
    lungpix = np.zeros((32, 32), bool)
    lungpix[iy[cls == 2], ix[cls == 2]] = True
    var = imgs.var(axis=0)
    assert var[lungpix].mean() > var[im.mask & ~lungpix].mean()
