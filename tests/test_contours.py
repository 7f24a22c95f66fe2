import numpy as np

from eitx.contours import (
    approx_poly_dp,
    arc_length,
    build_coordinate_list,
    find_external_contours,
    format_polygon_line,
    parse_polygon_line,
)
from eitx.contours.formats import from_yolo_label, split_coordinate_list, to_yolo_label
from eitx.geometry import points_in_polygon, polygon_area


def test_trace_single_square():
    m = np.zeros((20, 20), dtype=np.uint8)
    m[5:15, 3:13] = 1
    cs = find_external_contours(m)
    assert len(cs) == 1
    c = cs[0]
    # boundary pixels all on the rectangle border
    assert c[:, 0].min() == 3 and c[:, 0].max() == 12
    assert c[:, 1].min() == 5 and c[:, 1].max() == 14
    # perimeter of 10x10 block boundary = 4*9 = 36 pixels
    assert c.shape[0] == 36
    assert np.isclose(arc_length(c), 36.0)


def test_trace_multiple_components_and_min_size():
    m = np.zeros((30, 30), dtype=np.uint8)
    m[2:6, 2:6] = 1
    m[10:25, 10:25] = 1
    m[28, 28] = 1  # single pixel
    cs = find_external_contours(m)
    assert len(cs) == 3
    cs2 = find_external_contours(m, min_pixels=2)
    assert len(cs2) == 2


def test_trace_concave_shape_encloses_area():
    m = np.zeros((40, 40), dtype=np.uint8)
    m[5:35, 5:35] = 1
    m[5:20, 15:25] = 0  # notch from the top
    cs = find_external_contours(m)
    assert len(cs) == 1
    poly = cs[0].astype(float)
    a = polygon_area(poly)
    true_area = 30 * 30 - 15 * 10
    assert abs(a - true_area) / true_area < 0.1
    # point inside the notch is outside the contour
    assert not points_in_polygon(np.array([[20.0, 10.0]]), poly)[0]
    assert points_in_polygon(np.array([[10.0, 30.0]]), poly)[0]


def test_trace_one_pixel_line():
    m = np.zeros((10, 10), dtype=np.uint8)
    m[5, 2:8] = 1
    cs = find_external_contours(m)
    assert len(cs) == 1
    assert cs[0].shape[0] == 10  # out and back along the line


def test_approx_poly_dp_square():
    m = np.zeros((50, 50), dtype=np.uint8)
    m[10:40, 10:40] = 1
    c = find_external_contours(m)[0].astype(float)
    eps = 0.001 * arc_length(c)
    approx = approx_poly_dp(c, eps)
    assert 4 <= approx.shape[0] <= 8
    a = polygon_area(approx)
    assert abs(a - 29 * 29) / (29 * 29) < 0.05


def test_approx_poly_dp_circle_keeps_shape():
    yy, xx = np.mgrid[0:100, 0:100]
    m = ((xx - 50) ** 2 + (yy - 50) ** 2 < 30**2).astype(np.uint8)
    c = find_external_contours(m)[0].astype(float)
    approx = approx_poly_dp(c, 0.01 * arc_length(c))
    assert approx.shape[0] < c.shape[0] // 3
    r = np.linalg.norm(approx - [50, 50], axis=1)
    assert np.all(np.abs(r - 29.5) < 2.5)


def test_polygon_line_roundtrip():
    poly = np.array([[1, 2], [3, 4], [5, 6]])
    line = format_polygon_line(2, poly)
    cid, back = parse_polygon_line(line)
    assert cid == 2
    assert np.array_equal(back, poly)


def test_coordinate_list_contract():
    lst = build_coordinate_list(["0 1 1 2 2", "1 5 5 6 6"], (0.75, 0.8), "4 0 0 9 9")
    assert lst[0] == "0.75" and lst[1] == "0.8"
    assert lst[-1].startswith("4 ")
    spacing, polys = split_coordinate_list(lst)
    assert spacing == (0.75, 0.8)
    assert len(polys) == 3


def test_yolo_label_roundtrip():
    poly = np.array([[64.0, 128.0], [256.0, 128.0], [256.0, 300.0]])
    line = to_yolo_label(1, poly, (512, 512))
    cid, back = from_yolo_label(line, (512, 512))
    assert cid == 1
    assert np.allclose(back, poly, atol=0.01)


def test_native_tracer_matches_python():
    """The C++ tracer (default path) must be bit-identical to the Python
    Moore tracer across shapes: ellipse, 1-px appendages, isolated pixels,
    dense noise, holes."""
    import os

    import eitx.contours.trace as T

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:128, 0:128]
    cases = [
        ((xx - 64.0) / 50) ** 2 + ((yy - 64.0) / 35) ** 2 < 1,
        rng.random((96, 96)) > 0.62,
        np.zeros((16, 16), bool),
    ]
    bar = np.zeros((64, 64), bool)
    bar[10, 10] = True
    bar[20:23, 20:40] = True
    bar[40, 5:60] = True  # 1-px line exercises Jacob's criterion
    cases.append(bar)
    hole = np.zeros((48, 48), bool)
    hole[10:30, 10:30] = True
    hole[15:25, 15:25] = False  # internal hole: external-only semantics
    cases.append(hole)
    if T._load_native() is None:
        pytest.skip("native contour library unavailable")
    for m in cases:
        nat = T._find_external_contours_native(m, 1)
        os.environ["EITX_NATIVE_CONTOURS"] = "0"
        T._LIB_TRIED, T._LIB = False, None
        try:
            py = T.find_external_contours(m, 1)
        finally:
            os.environ["EITX_NATIVE_CONTOURS"] = "1"
            T._LIB_TRIED, T._LIB = False, None
        assert nat is not None
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            assert np.array_equal(a, b)
