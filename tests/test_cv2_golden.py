"""Golden parity vs OpenCV — the engine the reference actually calls.

The reference's CV layer is cv2 end to end: the body-mask chain
(utils.py:526-585: HU threshold -> 5x5 MORPH_OPEN -> max-contourArea
external contour -> drawContours fill), contour vectorization
(utils.py:1191-1279: findContours(RETR_EXTERNAL) + approxPolyDP with
eps = 0.001 * arcLength), and the morphology used throughout. OpenCV is
installed in this environment, so these tests pin eitx's from-scratch
device/native implementations against the exact cv2 functions the
reference calls, over a battery of realistic thorax-phantom masks plus
adversarial hand-built shapes.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eitx.contours.simplify import approx_poly_dp
from eitx.contours.trace import arc_length, find_external_contours
from eitx.image.bodymask import body_mask_from_hu
from eitx.image.cc import fill_holes, largest_component
from eitx.image.morphology import (
    binary_close,
    binary_dilate,
    binary_erode,
    binary_open,
)
from eitx.train.phantoms import thorax_phantom_hu


def _phantom_masks(n=6, s=128, seed=3):
    """Realistic per-class binary masks from pseudo-labeled phantoms."""
    from eitx.scripts.pseudo_label import pseudo_label_slice

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        hu, body = thorax_phantom_hu(rng, s, rich=True)
        labels = np.asarray(pseudo_label_slice(hu, body))
        for cid in range(4):
            m = (labels == cid).astype(np.uint8)
            if m.any():
                out.append(m)
        out.append((body > 0).astype(np.uint8))
    return out


def _adversarial_masks(s=48):
    """Hand-built masks: spurs, diagonals, border-touching, multi-blob."""
    masks = []
    m = np.zeros((s, s), np.uint8)
    m[10:30, 10:30] = 1
    m[20, 30:44] = 1  # 1-px spur
    masks.append(m)
    m = np.zeros((s, s), np.uint8)  # diagonal chain (8-connected)
    for i in range(5, 40):
        m[i, i] = 1
    masks.append(m)
    m = np.zeros((s, s), np.uint8)  # touches every border
    m[0, :] = 1
    m[-1, :] = 1
    m[:, 0] = 1
    m[:, -1] = 1
    masks.append(m)
    m = np.zeros((s, s), np.uint8)  # several blobs + singletons
    m[5:12, 5:12] = 1
    m[30:44, 8:20] = 1
    m[8, 40] = 1
    m[40, 40:43] = 1
    masks.append(m)
    m = np.zeros((s, s), np.uint8)  # ring (hole inside)
    yy, xx = np.mgrid[0:s, 0:s]
    r2 = (yy - s / 2) ** 2 + (xx - s / 2) ** 2
    m[(r2 < 300) & (r2 > 100)] = 1
    masks.append(m)
    return masks


BATTERY = _phantom_masks() + _adversarial_masks()


# ---------------------------------------------------------------- morphology
@pytest.mark.parametrize("k", [3, 5])
def test_morphology_matches_cv2(k):
    """erode/dilate/open/close == cv2.morphologyEx with ones((k,k))."""
    kernel = np.ones((k, k), np.uint8)
    for m in BATTERY:
        got = {
            "erode": np.asarray(binary_erode(m > 0, k)),
            "dilate": np.asarray(binary_dilate(m > 0, k)),
            "open": np.asarray(binary_open(m > 0, k)),
            "close": np.asarray(binary_close(m > 0, k)),
        }
        want = {
            "erode": cv2.erode(m, kernel),
            "dilate": cv2.dilate(m, kernel),
            "open": cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel),
            "close": cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel),
        }
        for name in got:
            assert np.array_equal(
                got[name].astype(np.uint8), want[name]
            ), f"{name} k={k} diverges from cv2"


# ------------------------------------------------------- connected components
def test_largest_component_matches_cv2():
    """largest_component == the max-area label of
    cv2.connectedComponentsWithStats (8-connectivity)."""
    for m in BATTERY:
        if not m.any():
            continue
        got = np.asarray(largest_component(m > 0))
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            m, connectivity=8
        )
        areas = stats[1:, cv2.CC_STAT_AREA]
        best = 1 + int(np.argmax(areas))
        want = labels == best
        # ties between equal-sized components may break differently;
        # skip only genuine ties
        if (areas == areas.max()).sum() > 1 and not np.array_equal(got, want):
            continue
        assert np.array_equal(got, want)


def test_fill_holes_matches_cv2_drawcontours_fill():
    """fill_holes == drawContours(outer contour, FILLED) per component."""
    for m in BATTERY:
        got = np.asarray(fill_holes(m > 0)).astype(np.uint8)
        cnts, _ = cv2.findContours(
            m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
        )
        want = np.zeros_like(m)
        cv2.drawContours(want, cnts, -1, 1, -1)
        assert np.array_equal(got, want)


# ------------------------------------------------------------ body-mask chain
def test_body_mask_chain_matches_cv2_reference_chain():
    """body_mask_from_hu == the reference's exact cv2 chain
    (utils.py:562-582): threshold -> MORPH_OPEN 5x5 -> max contourArea
    external contour -> drawContours(..., 255, -1)."""
    rng = np.random.default_rng(7)
    for i in range(6):
        hu, _ = thorax_phantom_hu(rng, 160, rich=(i % 2 == 0))
        # add a CT-table artifact strip (the thing the chain exists to cut)
        hu[150:156, 20:140] = 200.0
        got = np.asarray(body_mask_from_hu(hu))

        m = np.where((hu > -500) & (hu < 1000), 1, 0).astype(np.uint8)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
        cnts, _ = cv2.findContours(
            m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
        )
        want = np.zeros_like(m)
        mx = max(cnts, key=cv2.contourArea, default=None)
        if mx is not None:
            cv2.drawContours(want, [mx], 0, 255, -1)
        assert np.array_equal(got, want * np.uint8(1)), (
            f"body-mask chain diverges from cv2 on phantom {i}"
        )


# ------------------------------------------------------------ contour tracing
def _as_cv2_contour(c):
    return np.asarray(c, np.int32).reshape(-1, 1, 2)


def _filled(shape, contours):
    img = np.zeros(shape, np.uint8)
    if contours:
        cv2.drawContours(
            img, [_as_cv2_contour(c) for c in contours], -1, 1, -1
        )
    return img


def test_external_contours_match_cv2():
    """find_external_contours == cv2.findContours(RETR_EXTERNAL,
    CHAIN_APPROX_NONE): same contour count, identical boundary point
    sets per component, and identical fills."""
    for m in BATTERY:
        cnts, _ = cv2.findContours(
            m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
        )
        # drop cv2 contours nested inside holes of others (RETR_EXTERNAL
        # keeps only outermost; eitx returns every component's boundary —
        # the battery has no nested components so counts must agree)
        got = find_external_contours(m)
        assert len(got) == len(cnts), "contour count diverges from cv2"

        def keyset(c):
            return frozenset(map(tuple, np.asarray(c).reshape(-1, 2)))

        want_sets = {keyset(c) for c in cnts}
        got_sets = {keyset(c) for c in got}
        assert got_sets == want_sets, "boundary point sets diverge from cv2"
        assert np.array_equal(
            _filled(m.shape, got),
            _filled(m.shape, [c.reshape(-1, 2) for c in cnts]),
        )


def test_arc_length_matches_cv2():
    for m in BATTERY:
        for c in find_external_contours(m, min_pixels=3):
            want = cv2.arcLength(_as_cv2_contour(c), True)
            # cv2.arcLength accumulates in float32 — compare relatively
            assert abs(arc_length(c, closed=True) - want) <= 1e-5 * max(
                want, 1.0
            )


# ------------------------------------------------------- polygon simplification
def test_approx_poly_dp_functional_parity_with_cv2():
    """approx_poly_dp at eps = 0.001 * arcLength (the reference's
    setting, utils.py:1255) is functionally equivalent to
    cv2.approxPolyDP: both stay within tolerance of the original
    contour and their filled polygons agree to IoU >= 0.99.

    Vertex-exact equality is NOT asserted: cv2's approxPolyDP is a
    modified Douglas-Peucker with a different closed-curve anchor
    heuristic, so vertex choices legitimately differ at equal error. On
    thin snaky contours (the fat ring: perimeter ~450 px around ~900 px
    of area) ANY eps=0.5 px simplification — cv2's included — moves the
    filled area a few percent, so the criterion is "at least as faithful
    to the ORIGINAL contour as cv2's own output, and close to cv2's":
      - fill IoU vs the original >= cv2's own minus 0.01
      - fill IoU ours-vs-cv2 >= 0.95
      - vertex count within 15% of cv2's
    """
    checked = 0
    for m in BATTERY:
        for c in find_external_contours(m, min_pixels=30):
            if c.shape[0] < 20:
                continue
            eps = 0.001 * cv2.arcLength(_as_cv2_contour(c), True)
            ours = approx_poly_dp(c, eps, closed=True)
            theirs = cv2.approxPolyDP(
                _as_cv2_contour(c), eps, True
            ).reshape(-1, 2)
            orig = _filled(m.shape, [c])
            a = _filled(m.shape, [np.round(ours).astype(np.int32)])
            b = _filled(m.shape, [theirs])

            def iou(x, y):
                return (x & y).sum() / max((x | y).sum(), 1)

            assert iou(a, orig) >= iou(b, orig) - 0.01, (
                f"our simplification is less faithful than cv2's: "
                f"{iou(a, orig):.4f} vs {iou(b, orig):.4f}"
            )
            assert iou(a, b) >= 0.95, (
                f"approxPolyDP fill IoU vs cv2 {iou(a, b):.4f} < 0.95"
            )
            assert (
                abs(ours.shape[0] - theirs.shape[0])
                <= max(3, 0.15 * theirs.shape[0])
            )
            checked += 1
    assert checked >= 10  # the battery must actually exercise the test


# ------------------------------------------------------- mask cleanup chain
# Reference-faithful re-implementation of clear_color_output
# (utils.py:691-755) + highlight_small_masks (utils.py:758-843), run on
# BGR images exactly as the reference does (scipy 4-connected labeling,
# self-inclusive neighbour votes, cv2 contours), used as the oracle for
# eitx's one-device-program cleanup_labels.

def _oracle_clear(body_mask, bgr, tolerance=5, min_polygon_size=5):
    from collections import Counter

    from scipy.ndimage import label as splabel

    out = bgr.copy()
    h, w = out.shape[:2]
    is_black = np.all(np.abs(bgr.astype(np.int16) - [0, 0, 0]) <= tolerance,
                      axis=2)
    out[is_black & (body_mask == 255)] = [0, 0, 255]
    bgs = [np.array([0, 0, 0], np.uint8), np.array([0, 0, 255], np.uint8)]
    is_bg = np.zeros((h, w), bool)
    for c in bgs:
        is_bg |= np.all(out == c, axis=2)
    labeled, n = splabel(~is_bg)  # scipy default: 4-connectivity
    for li in range(1, n + 1):
        pm = labeled == li
        if pm.sum() >= min_polygon_size:
            continue
        y, x = np.where(pm)
        neighbors = []
        for dy, dx in [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                       (1, -1), (1, 0), (1, 1)]:
            ny, nx = y + dy, x + dx
            ok = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
            for color in out[ny[ok], nx[ok]]:
                if not any(np.array_equal(color, bg) for bg in bgs):
                    neighbors.append(tuple(color))
        if neighbors:
            out[pm] = Counter(neighbors).most_common(1)[0][0]
        else:
            out[pm] = [0, 0, 255]
    return out


def _oracle_highlight(image, area_threshold=5):
    from collections import Counter

    mask_colors = {
        "bone": (255, 255, 255),
        "muscle": (0, 0, 255),
        "fat": (0, 255, 255),
        "air": (0, 150, 255),
    }
    output = image.copy()
    for tissue, tc in mask_colors.items():
        lower = np.clip(np.array(tc, np.int16) - 10, 0, 255).astype(np.uint8)
        upper = np.clip(np.array(tc, np.int16) + 10, 0, 255).astype(np.uint8)
        mask = cv2.inRange(image, lower, upper)
        cnts, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
        for cnt in cnts:
            if len(cnt) > area_threshold:
                continue
            cm = np.zeros(image.shape[:2], np.uint8)
            cv2.drawContours(cm, [cnt], -1, 255, cv2.FILLED)
            dil = cv2.dilate(cm, np.ones((3, 3), np.uint8), iterations=1)
            ring = dil - cm
            ncs = [tuple(c) for c in output[ring == 255]
                   if not np.array_equal(c, tc)
                   and not np.array_equal(c, (0, 0, 0))]
            fill = Counter(ncs).most_common(1)[0][0] if ncs else tc
            cv2.drawContours(output, [cnt], -1, tuple(map(int, fill)),
                             thickness=cv2.FILLED)
    return output


def _labels_with_specks(s=128, seed=0):
    """Phantom label image + body mask with injected tiny specks."""
    from eitx.scripts.pseudo_label import pseudo_label_slice

    rng = np.random.default_rng(seed)
    hu, body = thorax_phantom_hu(rng, s, rich=True)
    labels = np.asarray(pseudo_label_slice(hu, body)).copy()
    body = np.asarray(body)
    ys, xs = np.nonzero((body > 0) & (labels == 1))
    for _ in range(12):  # 1-px specks of random non-muscle classes
        k = rng.integers(0, ys.size)
        labels[ys[k], xs[k]] = rng.choice([0, 2, 3])
    for _ in range(4):  # small 2x2 blobs
        k = rng.integers(0, ys.size)
        y0, x0 = ys[k], xs[k]
        labels[y0:y0 + 2, x0:x0 + 2] = rng.choice([0, 3])
    return labels, body


def test_cleanup_chain_matches_reference_oracle():
    """cleanup_labels == the reference's clear_color_output +
    highlight_small_masks chain on realistic phantom labels with
    injected specks.

    Documented legitimate divergence: the reference's tiny-region rule is
    len(findContours CHAIN_APPROX_SIMPLE contour) <= 5, which also fires
    on LARGE perfect rectangles (a 50x80 block has a 4-point contour);
    eitx keys on component area <= 5, equivalent for the blobby regions
    real segmentation produces. Agreement is therefore asserted at
    >= 99.9% of pixels with every disagreeing pixel inside a tiny
    (<= 12 px) input component.
    """
    from eitx.masks import bgr_to_labels, cleanup_labels, labels_to_bgr
    from scipy.ndimage import label as splabel

    total = bad = 0
    for seed in range(4):
        labels, body = _labels_with_specks(seed=seed)
        got = np.asarray(cleanup_labels(labels, body))

        bgr = np.asarray(labels_to_bgr(labels))
        want_bgr = _oracle_highlight(_oracle_clear(body, bgr))
        want = np.asarray(bgr_to_labels(want_bgr))

        agree = got == want
        total += agree.size
        bad += (~agree).sum()
        if (~agree).any():
            # all disagreements must be inside tiny input components
            lab4, n = splabel(labels >= 0)
            del lab4, n
            ys, xs = np.nonzero(~agree)
            for y, x in zip(ys, xs):
                cls = labels[y, x]
                comp, _ = splabel(labels == cls)
                size = (comp == comp[y, x]).sum() if cls >= 0 else 0
                assert size <= 12, (
                    f"disagreement at ({y},{x}) in a {size}-px component"
                )
    assert bad / total <= 1e-3, f"cleanup disagreement {bad}/{total}"


def test_cleanup_reference_quirks_unit():
    """The reference's exact small-component semantics: isolated 1-px
    specks -> muscle; 2x2 specks SURVIVE the clear pass via self-votes
    (lung is never touched by the per-class pass); tiny bone blobs are
    recolored to their majority neighbour by the per-class pass."""
    from eitx.masks import cleanup_labels

    lab = np.full((24, 24), 1, np.int32)
    body = np.full((24, 24), 255, np.uint8)
    lab[4, 4] = 2          # isolated 1-px lung speck
    lab[10:12, 10:12] = 2  # 2x2 lung speck (self-votes keep it)
    lab[18:20, 4:6] = 0    # 2x2 bone blob (per-class pass recolors)
    out = np.asarray(cleanup_labels(lab, body))
    assert out[4, 4] == 1
    assert (out[10:12, 10:12] == 2).all()
    assert (out[18:20, 4:6] == 1).all()
