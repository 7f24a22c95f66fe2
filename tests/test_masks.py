import numpy as np
import pytest

from eitx.masks import (
    bgr_to_labels,
    class_canvases,
    cleanup_labels,
    labels_to_bgr,
    overlay_with_transparency,
)
from eitx.select import select_axial_slice_number
from eitx.core.errors import SliceSelectionError


def test_label_bgr_roundtrip():
    lab = np.full((10, 10), -1, dtype=np.int32)
    lab[2:4, 2:4] = 0
    lab[5:7, 5:7] = 2
    bgr = labels_to_bgr(lab)
    assert tuple(bgr[2, 2]) == (255, 255, 255)
    assert tuple(bgr[5, 5]) == (255, 255, 0)
    assert tuple(bgr[0, 0]) == (0, 0, 0)
    back = bgr_to_labels(bgr)
    assert np.array_equal(back, lab)


def test_class_canvases_keys():
    lab = np.full((8, 8), -1, dtype=np.int32)
    lab[1, 1] = 0
    lab[2, 2] = 1
    lab[3, 3] = 2
    lab[4, 4] = 3
    cv = class_canvases(lab)
    assert set(cv) == {"bone", "muscles", "lung", "adipose"}
    assert tuple(cv["adipose"][4, 4]) == (0, 255, 255)
    assert cv["bone"][2, 2].sum() == 0


def test_cleanup_fills_body_with_muscle():
    lab = np.full((20, 20), -1, dtype=np.int32)
    lab[5:15, 5:15] = 2  # lung block
    body = np.zeros((20, 20), np.uint8)
    body[2:18, 2:18] = 255
    out = np.asarray(cleanup_labels(lab, body))
    assert out[3, 3] == 1  # black-in-body -> muscle
    assert out[10, 10] == 2  # lung preserved
    assert out[0, 0] == -1  # outside body untouched


def test_cleanup_relabels_small_components():
    lab = np.full((30, 30), -1, dtype=np.int32)
    lab[5:25, 5:25] = 1  # muscle sea
    lab[10:18, 10:18] = 2  # lung island (64 px, stays)
    lab[20, 20] = 0  # 1-px bone speck -> neighbor majority (muscle)
    body = np.full((30, 30), 255, np.uint8)
    out = np.asarray(cleanup_labels(lab, body))
    assert out[12, 12] == 2
    assert out[20, 20] == 1


def test_cleanup_without_body_mask():
    lab = np.full((16, 16), -1, dtype=np.int32)
    lab[4:12, 4:12] = 3
    out = np.asarray(cleanup_labels(lab, None))
    # no body fill; fat block preserved
    assert out[8, 8] == 3
    assert out[0, 0] == -1


def test_overlay_transparency():
    base = np.zeros((8, 8), dtype=np.uint8)
    mask = np.zeros((8, 8, 3), dtype=np.uint8)
    mask[2, 2] = (0, 0, 255)
    out = overlay_with_transparency(base, mask, alpha=0.5)
    assert out.shape == (8, 8, 3)
    assert out[2, 2, 2] == 127 or out[2, 2, 2] == 128


def _boxes(n_right=9, n_left=3, width=512):
    rng = np.random.default_rng(0)
    boxes = []
    for i in range(n_right):
        y = 30 + 40 * i
        boxes.append([300.0, y, 330.0, y + 20])
    for i in range(n_left):
        boxes.append([50.0, 100 + 30 * i, 90.0, 130 + 30 * i])
    boxes = np.array(boxes)
    return boxes[rng.permutation(len(boxes))]


def test_select_axial_slice():
    out = select_axial_slice_number(_boxes(), custom_offset=0)
    # 6th and 7th sorted right boxes have y1 = 230 and 270
    assert out == [230, 270, 250]
    out2 = select_axial_slice_number(_boxes(), custom_offset=-10)
    assert out2[2] == 240


def test_select_axial_slice_insufficient():
    with pytest.raises(SliceSelectionError):
        select_axial_slice_number(_boxes(n_right=5))
