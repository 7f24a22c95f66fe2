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
