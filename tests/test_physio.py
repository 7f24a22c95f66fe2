import os

import numpy as np
import pytest

from eitx.physio import (
    cole_cole,
    fft_filter,
    generate_material_tables,
    get_materials,
    interp_at_freq,
    make_spirometry,
    spirometry_to_conductivity,
    synthetic_ventilation,
    tissue_conductivities,
)
from eitx.core.config import ClassMap

REF_DATA = "/root/reference/kt_service/ai_tools/femm_tools/data"


def test_make_spirometry_shape_and_range():
    s = make_spirometry(12, 100)
    assert s.shape == (100, 2)
    assert s[0, 0] == 0.0
    assert np.isclose(s[-1, 0], 5.0)  # 60/12 seconds
    assert s[:, 1].min() >= -1e-9 and s[:, 1].max() <= 1.0 + 1e-9
    # starts at 0 volume (sin at 270 degrees)
    assert abs(s[0, 1]) < 1e-6


def test_cole_cole_muscle_matches_gabriel_low_freq():
    sigma, eps = cole_cole("muscles", np.array([100.0, 50000.0]))
    # Gabriel muscle: sigma ~0.2-0.35 S/m in this band, large permittivity.
    assert 0.15 < sigma[0] < 0.30
    assert 0.2 < sigma[1] < 0.55
    assert eps[0] > 1e5


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_generated_tables_close_to_reference_csvs():
    """Our Cole-Cole tables should track the reference CSVs (same Gabriel
    source) within a modest tolerance across 100 Hz - 1 MHz."""
    ref = get_materials(os.path.dirname(REF_DATA))
    gen = generate_material_tables()
    for mat in ("muscles", "fat"):
        for f in (1e2, 1e3, 1e4, 1e5, 1e6):
            r = interp_at_freq(ref[mat]["cond"], f)
            g = interp_at_freq(gen[mat]["cond"], f)
            assert abs(g - r) / max(abs(r), 1e-12) < 0.25, (mat, f, r, g)


def test_interp_compat_reference_semantics():
    table = np.array([[10.0, 11111.0], [100.0, 1.0], [1000.0, 2.0],
                      [10000.0, 3.0], [100000.0, 5.0], [1000000.0, 7.0]])
    # Reference quirk: 50 kHz uses the [1e5, 1e6] segment extrapolated down.
    v_compat = interp_at_freq(table, 5e4, compat_reference_interp=True)
    expected = 5.0 + (7.0 - 5.0) * (5e4 - 1e5) / (1e6 - 1e5)
    assert np.isclose(v_compat, expected)
    # Correct interpolation stays within the bracketing values.
    v = interp_at_freq(table, 5e4)
    assert 3.0 < v < 5.0
    # Sentinel handling below range.
    v_low = interp_at_freq(table, 5.0, compat_reference_interp=True)
    assert np.isfinite(v_low)


def test_spirometry_to_conductivity_endpoints():
    mats = generate_material_tables()
    s = make_spirometry(12, 50)
    spir = s[:, 1] * 1.5
    cond = spirometry_to_conductivity(s, 5e4, mats, spir)
    def_c = interp_at_freq(mats["lung"]["cond"], 5e4)
    inf_c = interp_at_freq(mats["lung"]["infl"], 5e4)
    # Zero volume -> conductivity between deflated value and full range;
    # schedule must stay within [inflated, deflated + margin].
    assert cond[:, 1].max() <= def_c + 1e-9
    assert cond[:, 1].min() >= inf_c - 1e-9
    # Monotone: more air -> lower conductivity
    order = np.argsort(s[:, 1])
    assert cond[order, 1][0] >= cond[order, 1][-1]


def test_tissue_conductivities_all_classes():
    mats = generate_material_tables()
    vals = tissue_conductivities(mats, 5e4, ClassMap().id_to_name())
    assert set(vals) == {"bone", "muscles", "lung", "fat", "skin"}
    assert all(v > 0 for v in vals.values())
    assert vals["bone"] < vals["fat"] < vals["muscles"]


def test_compat_swap_lung_fat():
    names = ClassMap(compat_swap_lung_fat=True).id_to_name()
    assert names[2] == "fat" and names[3] == "lung"
    names = ClassMap().id_to_name()
    assert names[2] == "lung" and names[3] == "fat"


def test_fft_filter_removes_band():
    t = np.arange(0, 10, 0.01)
    x = np.sin(2 * np.pi * 1.0 * t) + 0.5 * np.sin(2 * np.pi * 10.0 * t)
    y = fft_filter("low", 100.0, 5.0, x)
    # 10 Hz component should be mostly gone
    corr10 = np.abs(np.dot(y, np.sin(2 * np.pi * 10.0 * t)))
    corr1 = np.abs(np.dot(y, np.sin(2 * np.pi * 1.0 * t)))
    assert corr10 < 0.05 * corr1


def test_synthetic_ventilation_is_plausible():
    v = synthetic_ventilation(duration_s=60, fs=20, n_resp=12)
    assert v.shape[1] == 2
    x = v[:, 1]
    assert -0.2 < x.min() < 0.3 and 0.7 < x.max() < 1.2


def test_packaged_ventilation_trace():
    """The shipped recorded-style capture loads, has the reference's row
    count, and looks like breathing (dominant frequency in 0.1-0.5 Hz)."""
    from eitx.physio.spirometry import get_spirometry_ref

    trace = get_spirometry_ref()
    assert trace.shape == (2840, 2)
    t, x = trace[:, 0], trace[:, 1]
    assert 0.0 <= x.min() and x.max() <= 1.0
    fs = 1.0 / np.median(np.diff(t))
    spec = np.abs(np.fft.rfft(x - x.mean()))
    freqs = np.fft.rfftfreq(x.size, 1.0 / fs)
    f_peak = freqs[np.argmax(spec)]
    assert 0.1 < f_peak < 0.5, f_peak
    # cycle-period jitter: a real capture is not a pure sine
    zero_up = np.where((x[:-1] < 0.5) & (x[1:] >= 0.5))[0]
    periods = np.diff(t[zero_up])
    periods = periods[periods > 1.0]
    assert periods.std() / periods.mean() > 0.02


def test_recorded_schedule_monitoring():
    """spirometry_source='recorded' drives a full monitoring run with
    irregular (capture-shaped) lung conductivity."""
    from eitx.core.config import SimulationConfig
    from eitx.fem import simulate_eit_monitoring
    from eitx.physio.materials import generate_material_tables
    from eitx.physio.spirometry import recorded_schedule
    from meshfix import disk_mesh_with_classes

    mats = generate_material_tables()
    sample, cond = recorded_schedule(50, 5e4, mats)
    assert cond.shape == (50, 2)
    assert cond[:, 1].std() > 0  # breathing modulates conductivity
    # irregularity: unlike the synthetic sine, the recorded trace is not
    # periodic with a single period
    nodes, tris, cls = disk_mesh_with_classes(40, 5)
    mesh = {"NODES": nodes * 100.0, "TRIANGLES": tris, "CLASS": cls}
    cfg = SimulationConfig(n_points=6, spirometry_source="recorded",
                           pad_nodes_to=256, pad_elems_to=512)
    v, dt = simulate_eit_monitoring(mesh, cfg)
    assert v.shape == (6, 208) and np.isfinite(v).all()
    cfg2 = SimulationConfig(n_points=6, pad_nodes_to=256, pad_elems_to=512)
    v2, _ = simulate_eit_monitoring(mesh, cfg2)
    assert not np.allclose(v, v2)  # different breathing source
