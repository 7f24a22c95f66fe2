import numpy as np
import pytest

from eitx.geometry import polygon_area, points_in_polygon
from eitx.mesh import (
    add_skin,
    classify_triangles,
    create_mesh,
    export_mesh,
    find_outer_contour,
    render_mesh,
    triangulate_polygon,
    write_mesh_txt,
)
from eitx.mesh.export import read_mesh_txt


def _ellipse(cx=250, cy=250, rx=180, ry=150, n=100):
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + rx * np.cos(theta), cy + ry * np.sin(theta)], 1)


def _poly_line(cid, pts):
    return f"{cid} " + " ".join(f"{x:.2f} {y:.2f}" for x, y in pts)


@pytest.mark.parametrize("prefer_native", [True, False])
def test_triangulate_quality(prefer_native):
    poly = _ellipse()
    nodes, tris = triangulate_polygon(poly, lc=7, prefer_native=prefer_native)
    assert tris.shape[0] > 1000
    p = nodes[tris]
    area2 = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 2, 0] - p[:, 0, 0]
    ) * (p[:, 1, 1] - p[:, 0, 1])
    # all CCW, no degenerate elements
    assert np.all(area2 > 0)
    # mesh covers the ellipse area within 1%
    exact = np.pi * 180 * 150
    assert abs(area2.sum() / 2 - exact) / exact < 0.01
    # edge lengths concentrated near lc
    e = np.concatenate([p[:, 1] - p[:, 0], p[:, 2] - p[:, 1], p[:, 0] - p[:, 2]])
    L = np.linalg.norm(e, axis=1)
    assert 4.0 < np.median(L) < 10.0
    assert L.max() < 3 * 7


def test_triangulate_concave():
    # a C-shape (concave): triangles must not bridge the notch
    outer = [(0, 0), (100, 0), (100, 30), (30, 30), (30, 70), (100, 70),
             (100, 100), (0, 100)]
    poly = np.array(outer, dtype=float)
    nodes, tris = triangulate_polygon(poly, lc=6)
    cent = nodes[tris].mean(axis=1)
    assert points_in_polygon(cent, poly).all()
    area = polygon_area(poly)
    p = nodes[tris]
    a2 = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 2, 0] - p[:, 0, 0]
    ) * (p[:, 1, 1] - p[:, 0, 1])
    assert abs(a2.sum() / 2 - area) / area < 0.03


def test_classify_triangles_regions():
    poly = _ellipse()
    nodes, tris = triangulate_polygon(poly, lc=8)
    lung = _ellipse(cx=200, cy=250, rx=40, ry=60, n=40)
    bone = _ellipse(cx=320, cy=250, rx=25, ry=25, n=30)
    muscles = _ellipse(rx=175, ry=145, n=80)  # fills most of the body
    contours = [(1, muscles), (2, lung), (0, bone)]
    cls = classify_triangles(nodes, tris, contours, outer_class=4,
                             outer_poly=poly, skin_width=1)
    cent = nodes[tris].mean(axis=1)
    # lung centroids
    in_lung = points_in_polygon(cent, lung)
    assert (cls[in_lung] == 2).mean() > 0.9
    in_bone = points_in_polygon(cent, bone)
    assert (cls[in_bone] == 0).mean() > 0.9
    # muscle region (inside muscles but outside lung/bone)
    in_mus = points_in_polygon(cent, muscles) & ~in_lung & ~in_bone
    assert (cls[in_mus] == 1).mean() > 0.95


def test_classify_skin_minus_one():
    poly = _ellipse(n=80)
    nodes, tris = triangulate_polygon(poly, lc=10)
    cls = classify_triangles(nodes, tris, [], outer_class=0,
                             outer_poly=poly, skin_width=-1)
    cent = nodes[tris].mean(axis=1)
    r = np.linalg.norm((cent - [250, 250]) / [180, 150], axis=1)
    # boundary-touching triangles become class 4
    assert (cls[r > 0.97] == 4).mean() > 0.6
    assert (cls[r < 0.8] == 0).all()


def test_find_outer_contour_class4_priority():
    polys = ["1 0 0 10 0 10 10 0 10", "4 0 0 20 0 20 20 0 20"]
    assert find_outer_contour(polys) == 1


def test_find_outer_contour_union():
    sq1 = _poly_line(1, [(10, 10), (60, 10), (60, 60), (10, 60)])
    sq2 = _poly_line(2, [(50, 10), (100, 10), (100, 60), (50, 60)])
    polys = [sq1, sq2]
    idx = find_outer_contour(polys)
    assert idx == 2  # appended union line
    assert polys[2].startswith("4 ")
    from eitx.contours.formats import parse_polygon_line

    cid, pts = parse_polygon_line(polys[2])
    a = polygon_area(pts)
    assert abs(a - 90 * 50) / (90 * 50) < 0.1


def test_add_skin_offsets_outward():
    line = _poly_line(4, _ellipse(n=60))
    polys = [line]
    new_idx, polys = add_skin(0, polys, 3.0)
    assert new_idx == 1
    from eitx.contours.formats import parse_polygon_line

    _, pts = parse_polygon_line(polys[1])
    r = np.linalg.norm((pts - [250, 250]), axis=1)
    r0 = np.linalg.norm(_ellipse(n=60) - [250, 250], axis=1)
    assert r.mean() > r0.mean() + 2.0


def test_create_mesh_end_to_end(tmp_path):
    body = _poly_line(4, _ellipse(n=80))
    lung = _poly_line(2, _ellipse(cx=200, cy=250, rx=40, ry=60, n=40))
    fat = _poly_line(3, _ellipse(rx=175, ry=145, n=60))
    out = tmp_path / "mesh.txt"
    img, mesh = create_mesh(
        ["0.75", "0.75"], [lung, fat, body], lc=8,
        is_saving_to_file=True, export_filename=str(out),
    )
    assert img is not None and img.ndim == 3 and img.dtype == np.uint8
    assert len(mesh["TRIANGLES"]) == len(mesh["CLASS"])
    assert len(mesh["NODES"]) > 100
    cls = set(mesh["CLASS"])
    assert 2 in cls and 3 in cls and 4 in cls
    # round-trip the text format
    back = read_mesh_txt(str(out))
    assert back["TRIANGLES"] == mesh["TRIANGLES"]
    assert back["CLASS"] == mesh["CLASS"]
    assert np.allclose(np.array(back["NODES"]), np.array(mesh["NODES"]))


def test_export_compacts_nodes():
    nodes = np.array([[0, 0], [1, 0], [0, 1], [5, 5], [1, 1]], dtype=float)
    tris = np.array([[0, 1, 2], [1, 4, 2]])
    cls = np.array([1, 2])
    mesh = export_mesh(nodes, tris, cls)
    assert len(mesh["NODES"]) == 4  # node 3 dropped
    assert max(max(t) for t in mesh["TRIANGLES"]) == 3


def test_render_mesh_shape():
    poly = _ellipse(n=40)
    nodes, tris = triangulate_polygon(poly, lc=20)
    cls = np.zeros(tris.shape[0], dtype=np.int32)
    img = render_mesh(nodes, tris, cls)
    assert img.shape == (1000, 1000, 3)
    assert img.max() > 0


def test_create_mesh_random_polygon_fuzz():
    """Robustness net for the native mesher + classifier: blobby random
    polygons (star-convex with jagged radii, random class layouts) must
    either mesh with valid invariants or raise the typed MeshingError —
    never crash, never return out-of-range indices or classes."""
    import numpy as np

    from eitx.core.errors import MeshingError
    from eitx.mesh.api import create_mesh

    def blob(cid, cx, cy, r, rng, n=40):
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        rr = r * (1.0 + rng.uniform(-0.45, 0.45, n))
        pts = np.stack([cx + rr * np.cos(th), cy + rr * np.sin(th)], 1)
        return f"{cid} " + " ".join(f"{x:.1f} {y:.1f}" for x, y in pts)

    ok, typed = 0, 0
    for seed in range(12):
        rng = np.random.default_rng(seed)
        polys = [blob(4, 256, 256, 170 + rng.uniform(-30, 30), rng, 60)]
        for cid in rng.permutation([0, 1, 2, 3])[: rng.integers(1, 5)]:
            polys.append(
                blob(int(cid), 256 + rng.uniform(-80, 80),
                     256 + rng.uniform(-60, 60), rng.uniform(25, 90), rng)
            )
        try:
            _, mesh = create_mesh(
                ["1", "1"], polys, lc=12,
                show_meshing_result_method="no",
            )
        except MeshingError:
            typed += 1
            continue
        nodes = np.asarray(mesh["NODES"], np.float64)
        tris = np.asarray(mesh["TRIANGLES"])
        cls = np.asarray(mesh["CLASS"])
        assert np.isfinite(nodes).all()
        assert tris.min() >= 0 and tris.max() < nodes.shape[0]
        assert len(cls) == len(tris)
        assert set(np.unique(cls)) <= {0, 1, 2, 3, 4}
        # non-degenerate elements: positive area after orientation fix
        p = nodes[tris]
        area2 = np.abs(
            (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
            - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
        )
        assert (area2 > 0).all()
        ok += 1
    # the battery must mostly mesh (it's made of plausible bodies)
    assert ok >= 8, (ok, typed)
