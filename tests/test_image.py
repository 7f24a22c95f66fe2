import numpy as np

from eitx.image import (
    axial_stack_to_frontal,
    binary_dilate,
    binary_erode,
    binary_open,
    body_mask_from_hu,
    fill_holes,
    hu_transform,
    label_components,
    largest_component,
    minmax_normalize_u8,
    window_normalize,
)
from eitx.image.orientation import middle_frontal_slice, stack_axial_slices


def test_hu_transform():
    px = np.array([[0, 1000], [2000, 3000]], dtype=np.uint16)
    hu = np.asarray(hu_transform(px, 1.0, -1024.0))
    assert hu[0, 0] == -1024 and hu[1, 1] == 1976


def test_window_normalize_parity():
    # classic_norm semantics: clip to [level-w//2, level+w//2], scale, rot180
    vol = np.array([[-1000.0, -160.0], [40.0, 240.0]])
    out = np.asarray(window_normalize(vol, 40.0, 400.0))
    assert out.dtype == np.uint8
    # -160 -> 0 (hu_min), 240 -> 255 (hu_max), 40 -> 127ish
    # rotated 180: out[i,j] = f(vol[-1-i,-1-j])
    assert out[1, 1] == 0  # from vol[0,0] clipped to hu_min
    assert out[1, 0] == 0  # vol[0,1] == hu_min exactly
    assert out[0, 0] == 255  # vol[1,1] == hu_max
    assert abs(int(out[0, 1]) - 127) <= 1  # vol[1,0] == level


def test_window_normalize_batched():
    vol = np.random.default_rng(0).uniform(-1000, 1000, (4, 32, 32))
    out = np.asarray(window_normalize(vol))
    assert out.shape == (4, 32, 32)
    single = np.asarray(window_normalize(vol[2]))
    assert np.array_equal(out[2], single)


def test_morphology_open_removes_specks():
    m = np.zeros((32, 32), bool)
    m[5:25, 5:25] = True
    m[1, 1] = True  # speck
    out = np.asarray(binary_open(m, 5))
    assert not out[1, 1]
    assert out[15, 15]
    # open shrinks-then-grows: block interior preserved
    assert out[7:23, 7:23].all()


def test_erode_dilate():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    er = np.asarray(binary_erode(m, 3))
    assert er.sum() == 6 * 6
    di = np.asarray(binary_dilate(m, 3))
    assert di.sum() == 10 * 10


def test_label_components_and_largest():
    m = np.zeros((40, 40), bool)
    m[2:6, 2:6] = True  # 16 px
    m[10:30, 10:30] = True  # 400 px
    lab = np.asarray(label_components(m))
    assert lab[0, 0] == -1
    assert lab[3, 3] != lab[15, 15]
    assert (lab[10:30, 10:30] == lab[15, 15]).all()
    big = np.asarray(largest_component(m))
    assert big[15, 15] and not big[3, 3]
    assert big.sum() == 400


def test_fill_holes():
    m = np.zeros((30, 30), bool)
    m[5:25, 5:25] = True
    m[10:15, 10:15] = False  # hole
    m[0:3, 0:3] = False
    out = np.asarray(fill_holes(m))
    assert out[12, 12]
    assert not out[0, 0]
    assert out.sum() == 400


def test_body_mask_from_hu():
    hu = np.full((64, 64), -1000.0)
    hu[10:50, 10:50] = 40.0  # body
    hu[20:30, 20:30] = -800.0  # lung-like hole inside body
    hu[60:63, 60:63] = 50.0  # table artifact (smaller component)
    mask = np.asarray(body_mask_from_hu(hu))
    assert mask.dtype == np.uint8
    assert mask[30, 30] == 255
    assert mask[25, 25] == 255  # hole filled
    assert mask[61, 61] == 0  # artifact dropped
    assert mask[0, 0] == 0


def test_minmax_normalize():
    x = np.array([[0.0, 5.0], [10.0, 10.0]])
    out = np.asarray(minmax_normalize_u8(x))
    assert out[0, 0] == 0 and out[1, 1] == 255
    assert out[0, 1] in (127, 128)


def test_axial_to_frontal_orientations():
    vol = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(float)
    hfs = axial_stack_to_frontal(vol, "HFS", [1, 0, 0, 0, 1, 0], None)
    assert hfs.shape == (4, 3, 2)
    assert np.array_equal(hfs, np.transpose(vol, (2, 1, 0)))
    ffs = axial_stack_to_frontal(vol, "FFS", [1, 0, 0, 0, 1, 0], None)
    assert np.array_equal(ffs, np.flipud(np.transpose(vol, (2, 1, 0))))
    # orientation sign flip
    neg = axial_stack_to_frontal(vol, "HFS", [-1, 0, 0, 0, 1, 0], None)
    assert np.array_equal(neg, np.flip(np.transpose(vol, (2, 1, 0)), axis=1))


def test_stack_and_middle():
    slices = [np.full((4, 4), i) for i in range(5)]
    vol = stack_axial_slices(slices)
    assert vol.shape == (4, 4, 5)
    front = axial_stack_to_frontal(vol, "HFS", None, None)
    mid = middle_frontal_slice(front)
    assert mid.shape == (5, 4)
