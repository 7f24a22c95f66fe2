import numpy as np
import pytest

from eitx.geometry import (
    calc_dist,
    calc_lin_coef,
    check_point_in_line,
    cut_min_area_close_points,
    ensure_closed,
    filter_degr_polyfit,
    filter_inline_points,
    interpolate_big_vert_breaks_lin,
    merge_collinear,
    offset_polygon,
    point_line_distance,
    points_in_polygon,
    poly_area,
    polygon_area,
    polygon_centroid,
    rasterize_polygons,
)


def test_calc_lin_coef():
    k, b = calc_lin_coef([0, 1], [2, 5])
    assert np.isclose(k, 2.0) and np.isclose(b, 1.0)
    with pytest.raises(ValueError):
        calc_lin_coef([1, 0], [1, 5])


def test_calc_dist():
    assert np.isclose(calc_dist([0, 0], [3, 4]), 5.0)
    assert np.isclose(
        calc_dist(np.array([0, 0]), np.array([3, 4]), "max_coord_dif"), 4.0
    )
    with pytest.raises(ValueError):
        calc_dist([0, 0], [1, 1], "bogus")


def test_check_point_in_line():
    data = np.array([[0.0, 0.0], [1.0, 1.0]])
    assert check_point_in_line(data, (2.0, 2.0), 0.1)
    assert not check_point_in_line(data, (2.0, 3.0), 0.1)
    vert = np.array([[1.0, 0.0], [1.0, 2.0]])
    assert check_point_in_line(vert, (1.0, 5.0), 0.1)
    assert not check_point_in_line(vert, (2.0, 5.0), 0.1)


def test_poly_area_square():
    assert np.isclose(poly_area([0, 2, 2, 0], [0, 0, 2, 2]), 4.0)
    assert np.isclose(polygon_area(np.array([[0, 0], [2, 0], [2, 2], [0, 2]])), 4.0)


def test_filter_inline_points_removes_collinear():
    data = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [3.0, 3.0]])
    out = filter_inline_points(data, accuracy=1e-6)
    # collinear run collapses; corner survives
    assert out.shape[0] <= 3
    assert [3.0, 3.0] in out.tolist()


def test_cut_min_area_close_points_cuts_small_loop():
    # big square with a tiny appendix loop returning near point 1
    data = np.array(
        [
            [0.0, 0.0],
            [10.0, 0.0],
            [10.001, 0.001],  # near-duplicate -> loop split here
            [10.2, 0.1],
            [10.0, 0.0001],  # close back
            [10.0, 10.0],
            [0.0, 10.0],
        ]
    )
    out = cut_min_area_close_points(data, min_area=1.0, accuracy=0.01)
    assert out.shape[0] < data.shape[0]
    assert poly_area(out[:, 0], out[:, 1]) > 50


def test_filter_degr_polyfit_truncates_on_corner():
    flat = np.stack([np.arange(20.0), np.zeros(20)], 1)
    wall = np.stack([19.0 + np.arange(1, 16.0) * 0.01, np.arange(1, 16.0) * 5], 1)
    data = np.vstack([flat, wall])
    out = filter_degr_polyfit(data, min_deg=45, n_points=5)
    assert out.shape[0] <= flat.shape[0] + 5


def test_interpolate_big_vert_breaks_lin_fills_gap():
    data = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [13.0, 0.0]])
    out = interpolate_big_vert_breaks_lin(data, 5)
    assert out.shape[0] > data.shape[0]
    gaps = np.linalg.norm(np.diff(out, axis=0), axis=1)
    assert gaps.max() < 10.0


def test_merge_collinear():
    contour = [0, 0, 1, 0, 2, 0.1, 3, 0]
    out = merge_collinear(contour, distance_threshold=1.3)
    assert out[:2] == [0, 0] and out[-2:] == [3, 0]
    assert len(out) < len(contour) + 2


def test_point_line_distance():
    assert np.isclose(point_line_distance(0, 1, -1, 0, 1, 0), 1.0)
    assert np.isclose(point_line_distance(3, 4, 0, 0, 0, 0), 5.0)


def test_points_in_polygon():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    pts = np.array([[2, 2], [5, 5], [-1, 2], [3.9, 3.9]])
    inside = points_in_polygon(pts, sq)
    assert inside.tolist() == [True, False, False, True]
    # padding with repeated vertices must not change the result
    padded = np.vstack([sq, np.tile(sq[-1], (7, 1))])
    assert points_in_polygon(pts, padded).tolist() == inside.tolist()


def test_offset_polygon_grows_area():
    theta = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    circle = np.stack([10 * np.cos(theta), 10 * np.sin(theta)], 1)
    out = offset_polygon(circle, 2.0)
    r = np.linalg.norm(out[:-1], axis=1)
    assert np.allclose(r, 12.0, atol=0.1)
    # clockwise input handled too
    out_cw = offset_polygon(circle[::-1], 2.0)
    r = np.linalg.norm(out_cw[:-1], axis=1)
    assert np.allclose(r, 12.0, atol=0.1)


def test_ensure_closed():
    c = np.array([[0, 0], [1, 0], [1, 1]])
    out = ensure_closed(c)
    assert np.array_equal(out[0], out[-1])
    assert ensure_closed(out).shape == out.shape


def test_rasterize_polygons_labels():
    sq = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], dtype=float)
    tri = np.array([[3, 3], [6, 3], [3, 6]], dtype=float)
    img = rasterize_polygons([(1, sq), (2, tri)], (12, 12))
    assert img[5, 5] in (1, 2)
    assert img[4, 4] == 2  # later polygon wins
    assert img[0, 0] == -1
    assert img[6, 7] == 1
