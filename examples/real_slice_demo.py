"""EIT dataset from the reference's embedded patient-derived slice.

The reference ships exactly one piece of real segmented-patient geometry:
the polygon set embedded in its meshing self-test
(femm_generator.py:748-829). This demo runs that slice through the full
eitx tail — polygons -> triangulation -> tissue classification ->
electrode placement -> spectral forward solve over a breathing cycle ->
.dat dataset — and renders the classified mesh.

Usage:  python examples/real_slice_demo.py [out_dir] [lc]
"""

from __future__ import annotations

import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_fixture_polygons() -> list:
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "real_slice_polygons.txt",
    )
    with open(path) as fh:
        return [
            ln.strip() for ln in fh if ln.strip() and not ln.startswith("#")
        ]


def main(out_dir: str = ".", lc: float = 10.0, n_points: int = 20):
    from eitx.core.config import SimulationConfig
    from eitx.mesh.api import create_mesh
    from eitx.mesh.render import render_mesh
    from eitx.fem.forward import simulate_eit_monitoring

    polygons = load_fixture_polygons()
    t0 = time.time()
    _, mesh = create_mesh(
        ["1", "1"], polygons, lc, 1.3, 1, True,
        show_meshing_result_method="no",
    )
    cls = np.asarray(mesh["CLASS"])
    hist = dict(sorted(collections.Counter(cls.tolist()).items()))
    print(
        f"mesh: {len(mesh['NODES'])} nodes, {len(mesh['TRIANGLES'])} "
        f"elements in {time.time() - t0:.1f}s; class histogram {hist}"
    )

    img = render_mesh(
        np.asarray(mesh["NODES"]), np.asarray(mesh["TRIANGLES"]), cls
    )
    png = os.path.join(out_dir, "real_slice_mesh.png")
    try:
        import PIL.Image

        PIL.Image.fromarray(img).save(png)
        print("mesh render ->", png)
    except Exception:
        np.save(png + ".npy", img)

    cfg = SimulationConfig(n_points=n_points, n_spir=1, n_minutes=1)
    dat = os.path.join(out_dir, "real_slice_dataset.dat")
    t0 = time.time()
    v, sim_s = simulate_eit_monitoring(
        mesh, cfg, save_to_file=True, filename=dat
    )
    v = np.asarray(v)
    print(
        f"EIT dataset: {v.shape[0]} frames x {v.shape[1]} measurements "
        f"in {time.time() - t0:.1f}s -> {dat}"
    )
    print(
        "breathing modulation std (mean over channels): "
        f"{float(v.std(axis=0).mean()):.5f}"
    )
    print("REAL_SLICE_DEMO_OK")
    return v, mesh


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "."
    lc = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    main(out, lc)
