"""Keep the example scripts importable and functional (coarse meshes)."""

import runpy
import sys

import numpy as np
import pytest


@pytest.mark.parametrize(
    "script", ["building_floorplan", "spiral_art", "gear_section"]
)
def test_examples_run(tmp_path, monkeypatch, script):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/examples")
    try:
        mod = __import__(script)
        mod.main()
    finally:
        sys.path.remove("/root/repo/examples")
    assert any(p.suffix == ".png" for p in tmp_path.iterdir())


def test_eit_monitoring_example(tmp_path, monkeypatch):
    """The physics example runs end-to-end on a coarse mesh."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/examples")
    try:
        mod = __import__("eit_monitoring")
        v, dsigma = mod.main(str(tmp_path), lc=14.0, n_points=4)
    finally:
        sys.path.remove("/root/repo/examples")
    assert v.shape[0] == 4 and np.isfinite(v).all()
    assert dsigma.shape[0] == 4 and np.isfinite(dsigma).all()
    assert (tmp_path / "monitoring.dat").exists()
    assert (tmp_path / "greit_strip.png").stat().st_size > 0
