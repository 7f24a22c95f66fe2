"""Thorax HU phantoms + pseudo-label training targets.

The reference's tissue models are trained on CT slices pseudo-labeled by
HU thresholds (scripts/create_femm_dataset.py:509-567,757-762). This module
reproduces that recipe without patient data: anatomically-shaped random
thorax phantoms in Hounsfield units (fat ring, muscle layer, two lungs,
spine/sternum bone, soft-tissue noise), labeled by the SAME device
pseudo-labeler the dataset builders use (scripts/pseudo_label.py), then
converted to the trainer's instance targets (boxes / classes / proto-res
masks). Train/inference preprocessing match: images are the WL40/WW400
windowed uint8 slices the pipeline feeds the segmenter (utils.py:272-313).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..image import window_normalize
from ..scripts.pseudo_label import pseudo_label_slice

# HU means per structure (typical thoracic CT values)
_HU = {
    "air": -1000.0,
    "lung": -780.0,
    "fat": -90.0,
    "muscle": 35.0,
    "bone": 350.0,
}


def _partial_volume(hu: np.ndarray, sigma: float) -> np.ndarray:
    """Scanner-PSF partial-volume blur of an HU image (labels stay crisp).

    Real CT boundaries are mixtures over the reconstruction kernel's
    footprint; the phantoms' piecewise-constant tissues are a training
    shortcut real data never takes. Blurring the IMAGE only (after the
    pseudo-labels are computed from the crisp HU map) teaches the model
    to segment through partial-volume boundaries."""
    from scipy import ndimage

    return ndimage.gaussian_filter(hu, sigma, mode="nearest")


def _ellipse(xx, yy, cx, cy, rx, ry, rot=0.0):
    ca, sa = np.cos(rot), np.sin(rot)
    xr = (xx - cx) * ca + (yy - cy) * sa
    yr = -(xx - cx) * sa + (yy - cy) * ca
    return (xr / rx) ** 2 + (yr / ry) ** 2 < 1.0


def _blob(xx, yy, cx, cy, rx, ry, rot, rng, amp):
    """Irregular ellipse: the radial boundary is modulated by a low-order
    Fourier series in polar angle (harmonics 2-5, amplitude ``amp``).

    Real anatomy (the patient-derived fixture, femm_generator.py:748-829)
    has no elliptical boundaries — bodies bulge, muscle rings pinch, lungs
    are kidney-shaped. Pure-ellipse phantoms taught the detection heads an
    ellipse prior strong enough that irregular muscle/fat rings scored
    below the serving conf threshold (OOD fixture eval, round 3)."""
    ca, sa = np.cos(rot), np.sin(rot)
    xr = ((xx - cx) * ca + (yy - cy) * sa) / rx
    yr = (-(xx - cx) * sa + (yy - cy) * ca) / ry
    th = np.arctan2(yr, xr)
    mod = np.ones_like(th)
    for k in range(2, 6):
        mod += (amp * rng.uniform(0.3, 1.0) / (k - 1)) * np.cos(
            k * th + rng.uniform(0.0, 2.0 * np.pi)
        )
    return xr * xr + yr * yr < mod * mod


def _paint_discrete_muscles(xx, yy, cx, cy, rx, ry, rot, rng, hu, body, s):
    """Paint individual muscle groups instead of one body-sized ring.

    The patient-derived fixture (femm_generator.py:748-829) labels
    muscle as ~43 SEPARATE polygons — paraspinal columns, pectoral
    sheets, lateral intercostal bands, scattered small groups — with
    fat as the connected background web between them. Ring-muscle
    phantoms taught the detector that a muscle instance is a body-sized
    ellipse; on real anatomy the muscle class head then never fired at
    all (max sigmoid 0.002 on the OOD fixture eval, round 3). This
    layout matches the real instance statistics: many discrete,
    irregular, widely-sized muscle instances."""
    ca, sa = np.cos(rot), np.sin(rot)

    def place(u, v, mrx, mry, mrot, amp):
        # (u, v) body-normalized coords (u lateral, v +posterior)
        px = cx + (u * rx) * ca - (v * ry) * sa
        py = cy + (u * rx) * sa + (v * ry) * ca
        m = _blob(xx, yy, px, py, max(mrx, 1.5), max(mry, 1.5),
                  rot + mrot, rng, amp)
        hu[m & body] = _HU["muscle"]

    # paraspinal pair (posterior, flanking the spine)
    for side in (-1, 1):
        place(side * rng.uniform(0.10, 0.26), rng.uniform(0.50, 0.68),
              rx * rng.uniform(0.09, 0.16), ry * rng.uniform(0.10, 0.20),
              rng.uniform(-0.3, 0.3), rng.uniform(0.04, 0.12))
    # pectoral / anterior sheets (wide, flat)
    for side in (-1, 1):
        if rng.random() < 0.9:
            place(side * rng.uniform(0.22, 0.45), -rng.uniform(0.55, 0.75),
                  rx * rng.uniform(0.14, 0.28), ry * rng.uniform(0.04, 0.09),
                  side * rng.uniform(0.0, 0.35), rng.uniform(0.04, 0.12))
    # lateral bands along the rim (intercostal / serratus), tangential
    for _ in range(rng.integers(2, 6)):
        th = rng.uniform(0, 2 * np.pi)
        rfac = rng.uniform(0.78, 0.92)
        u, v = rfac * np.cos(th), rfac * np.sin(th)
        tangent = np.arctan2(ry * np.cos(th), -rx * np.sin(th))
        place(u, v, rx * rng.uniform(0.08, 0.22),
              ry * rng.uniform(0.025, 0.06), tangent,
              rng.uniform(0.04, 0.10))
    # scattered small groups (the fixture's long tail of tiny polygons)
    for _ in range(rng.integers(4, 14)):
        th = rng.uniform(0, 2 * np.pi)
        rfac = rng.uniform(0.25, 0.95)
        place(rfac * np.cos(th), rfac * np.sin(th),
              s * rng.uniform(0.008, 0.035), s * rng.uniform(0.008, 0.035),
              rng.uniform(0, np.pi), rng.uniform(0.05, 0.15))
    # heart: a large central-anterior muscle mass between the lungs (the
    # fixture's two biggest muscle polygons, 134x165/125x112 px — lungs
    # wrap around it; without it the medial lung boundary is an
    # appearance the model never sees)
    if rng.random() < 0.85:
        place(rng.uniform(-0.12, 0.12), -rng.uniform(0.0, 0.30),
              rx * rng.uniform(0.16, 0.28), ry * rng.uniform(0.20, 0.34),
              rng.uniform(-0.4, 0.4), rng.uniform(0.04, 0.12))


def thorax_phantom_hu(
    rng: np.random.Generator, s: int = 256, rich: bool = False,
    anatomy: bool = False, wide_pose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random thorax slice in HU. Returns (hu (s, s) f32, body mask).

    ``rich=True`` widens the anatomical variability (rotation, asymmetric
    breathing, calcifications, occasional single lung, noise level, and
    irregular Fourier-modulated boundaries for body/muscle/lungs) for
    harder training distributions; the default keeps the original
    distribution so committed checkpoint reports stay reproducible.

    ``anatomy=True`` switches to the discrete-instance layout (see
    _paint_discrete_muscles): muscle as many separate groups, fat as the
    background web, an articulated bone set (spine + sternum + many ribs
    + scapular plates) — the instance statistics of the patient-derived
    fixture, which the ring layouts do not cover.

    ``wide_pose=True`` widens the POSE distribution (not the anatomy) to
    the plausible thoracic serving-pose family the posed OOD eval draws
    from (scripts/eval_ood_fixture.py:fixture_transform: tilt to ~26 deg,
    zoom-out to 0.65, shifts): rotation to +-0.45 rad, body sizes down to
    0.65x the layout's native minimum, center offsets to 0.09. Opt-in so
    every committed eval distribution (easy/rich/anatomy, seed 424242)
    stays bit-reproducible; draw COUNT is unchanged either way, only the
    ranges, so the stream stays aligned across the flag."""
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    rich = rich or anatomy
    off = 0.09 if wide_pose else (0.06 if rich else 0.04)
    cx = s / 2 + rng.uniform(-s * off, s * off)
    cy = s / 2 + rng.uniform(-s * off, s * off)
    rmax = 0.45 if wide_pose else (0.30 if rich else 0.12)
    rot = rng.uniform(-rmax, rmax)
    # anatomy mode samples up to frame-filling bodies: the patient-derived
    # fixture's body spans the FULL image width (rx ~0.50s, edge-clipped,
    # body fraction 0.67 vs 0.32 for the classic ranges) — serving inputs
    # are zoomed like that, and a model trained only on small-in-frame
    # bodies under-sizes its boxes there (right lung at conf 0.25 < 0.3,
    # lung boxes truncated; OOD fixture eval, round 3).
    # wide_pose lowers the minimum toward the zoomed-OUT end of the same
    # serving family (a 0.65-zoom fixture body lands at rx ~0.33s, below
    # the anatomy layout's native 0.34 floor — the exact pose that first
    # lost the thin fat rim in the posed OOD drive).
    if anatomy:
        rx = s * rng.uniform(0.27 if wide_pose else 0.34, 0.52)
        ry = s * rng.uniform(0.21 if wide_pose else 0.26, 0.42)
    else:
        rx = s * rng.uniform(0.26 if wide_pose else 0.33, 0.42)
        ry = s * rng.uniform(0.19 if wide_pose else 0.24, 0.32)

    hu = np.full((s, s), _HU["air"], np.float32)
    if rich:
        # irregular boundaries (see _blob): real bodies/rings/lungs are
        # not ellipses, and the OOD patient-fixture eval showed the
        # ellipse prior suppresses detections on irregular shapes
        body = _blob(xx, yy, cx, cy, rx, ry, rot, rng,
                     rng.uniform(0.0, 0.05))
    else:
        body = _ellipse(xx, yy, cx, cy, rx, ry, rot)
    # fat ring (body minus muscle zone); anatomy mode: fat is the
    # connected background web with discrete muscle groups on top
    hu[body] = _HU["fat"]
    if anatomy:
        _paint_discrete_muscles(xx, yy, cx, cy, rx, ry, rot, rng, hu,
                                body, s)
        muscle = body  # lungs/calcifications carve from the body interior
    else:
        mcx = cx + (rng.uniform(-s * 0.02, s * 0.02) if rich else 0.0)
        mcy = cy + (rng.uniform(-s * 0.02, s * 0.02) if rich else 0.0)
        if rich:
            muscle = _blob(xx, yy, mcx, mcy, rx * rng.uniform(0.88, 0.94),
                           ry * rng.uniform(0.86, 0.93), rot, rng,
                           rng.uniform(0.0, 0.06)) & body
        else:
            muscle = _ellipse(xx, yy, mcx, mcy, rx * rng.uniform(0.88, 0.94),
                              ry * rng.uniform(0.86, 0.93), rot)
        hu[muscle] = _HU["muscle"]
        # inner mediastinum fat pockets
        for _ in range(rng.integers(0, 5 if rich else 3)):
            fx = cx + rng.uniform(-rx * 0.2, rx * 0.2)
            fy = cy + rng.uniform(-ry * 0.3, ry * 0.3)
            pocket = _ellipse(xx, yy, fx, fy, s * rng.uniform(0.02, 0.05),
                              s * rng.uniform(0.02, 0.05), rng.uniform(0, 3))
            hu[pocket & muscle] = _HU["fat"]
    # two lungs (breathing-phase size jitter; rich: independent per-lung
    # phase + 5% single-lung cases)
    breath = rng.uniform(0.75, 1.1)
    sides = (-1, 1)
    if rich and rng.random() < 0.05:
        sides = (rng.choice([-1, 1]),)
    for side in sides:
        b = rng.uniform(0.70, 1.15) if rich else breath
        lx = cx + side * rx * (rng.uniform(0.30, 0.50) if anatomy
                               else rng.uniform(0.36, 0.46))
        ly = cy + ry * rng.uniform(-0.08, 0.08)
        # anatomy: wider lung-fraction ranges — the fixture's lungs reach
        # 0.39*rx half-width and 0.67*ry half-height (area 0.14 of the
        # frame EACH), beyond the classic maxima
        lrx = rx * (rng.uniform(0.24, 0.40) if anatomy
                    else rng.uniform(0.24, 0.32)) * b
        lry = ry * (rng.uniform(0.42, 0.78) if anatomy
                    else rng.uniform(0.45, 0.62)) * b
        if rich:
            # kidney-shaped lungs: stronger boundary modulation (anatomy:
            # up to deeply-lobed — the fixture's lungs are far from
            # elliptical and one was entirely missed before this)
            lung = _blob(xx, yy, lx, ly, lrx, lry,
                         rot + side * rng.uniform(0.0, 0.25), rng,
                         rng.uniform(0.03, 0.16) if anatomy
                         else rng.uniform(0.02, 0.10))
        else:
            lung = _ellipse(xx, yy, lx, ly, lrx, lry,
                            rot + side * rng.uniform(0.0, 0.25))
        hu[lung & muscle] = _HU["lung"]
    # spine (posterior) + sternum (anterior) bone
    sp = _ellipse(xx, yy, cx + rng.uniform(-2, 2),
                  cy + ry * rng.uniform(0.55, 0.7),
                  s * rng.uniform(0.035, 0.055),
                  s * rng.uniform(0.03, 0.05), rot)
    st = _ellipse(xx, yy, cx + rng.uniform(-2, 2),
                  cy - ry * rng.uniform(0.72, 0.85),
                  s * rng.uniform(0.02, 0.035),
                  s * rng.uniform(0.012, 0.02), rot)
    hu[sp & body] = _HU["bone"]
    hu[st & body] = _HU["bone"]
    # rib cross-sections on the body rim (anatomy: a full articulated
    # cage — the fixture has ~20 separate bone polygons)
    n_ribs = rng.integers(8, 18) if anatomy else rng.integers(2, 6)
    for _ in range(n_ribs):
        ang = rng.uniform(0, 2 * np.pi)
        rfac = rng.uniform(0.82, 0.95) if anatomy else 0.93
        bx = cx + rx * rfac * np.cos(ang)
        by = cy + ry * rfac * np.sin(ang)
        rib = _ellipse(xx, yy, bx, by,
                       s * (rng.uniform(0.010, 0.022) if anatomy else 0.015),
                       s * (rng.uniform(0.006, 0.013) if anatomy else 0.01),
                       ang)
        hu[rib & body] = _HU["bone"]
    if anatomy:
        # scapular plates: elongated thin bone posterior-lateral
        for side in (-1, 1):
            if rng.random() < 0.7:
                th = np.arctan2(rng.uniform(0.25, 0.55),
                                side * rng.uniform(0.5, 0.75))
                tangent = np.arctan2(ry * np.cos(th), -rx * np.sin(th))
                px = cx + 0.72 * (rx * np.cos(th) * np.cos(rot)
                                  - ry * np.sin(th) * np.sin(rot))
                py = cy + 0.72 * (rx * np.cos(th) * np.sin(rot)
                                  + ry * np.sin(th) * np.cos(rot))
                plate = _blob(xx, yy, px, py, rx * rng.uniform(0.10, 0.20),
                              s * rng.uniform(0.006, 0.012),
                              rot + tangent, rng, rng.uniform(0.02, 0.08))
                hu[plate & body] = _HU["bone"]
    if rich:
        # calcifications: small bone islands inside the muscle zone
        for _ in range(rng.integers(0, 4)):
            ang = rng.uniform(0, 2 * np.pi)
            r = rng.uniform(0.3, 0.8)
            bx = cx + rx * r * np.cos(ang)
            by = cy + ry * r * np.sin(ang)
            isl = _ellipse(xx, yy, bx, by, s * rng.uniform(0.008, 0.02),
                           s * rng.uniform(0.008, 0.02), ang)
            hu[isl & muscle] = _HU["bone"]
    sigma_n = rng.uniform(8.0, 20.0) if rich else 12.0
    hu += rng.normal(0.0, sigma_n, hu.shape).astype(np.float32)
    return hu, (body * 255).astype(np.uint8)


# --- real-geometry training stream --------------------------------------

# Training draws ONLY from geometries 2-5 (four processing variants of
# one anatomy, mesh_service_trials.py test_list2..5 via
# eitx.scripts.harvest_trials); geometries 1 and 6 stay eval-only so the
# OOD-fixture protocol keeps two real-derived anatomies no training
# stream has ever seen.
_TRAIN_GEOMETRIES = (2, 3, 4, 5)
_geom_pool_cache: Dict[int, list] = {}


def _train_geometry_polygons(gid: int) -> list:
    import os

    if gid in (1, 6):
        raise ValueError(
            f"geometry {gid} is reserved for the OOD eval — training on "
            "it would collapse the quality protocol's held-out anatomies"
        )
    if gid not in _geom_pool_cache:
        path = os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "data",
            "geometries", f"trial{gid}.txt",
        )
        polys = []
        with open(path) as fh:
            for ln in fh:
                ln = ln.strip()
                if not ln or ln.startswith("#"):
                    continue
                parts = ln.split()
                polys.append(
                    (int(parts[0]),
                     np.asarray(parts[1:], np.float64).reshape(-1, 2))
                )
        _geom_pool_cache[gid] = polys
    return _geom_pool_cache[gid]


def geometry_slice_hu(
    rng: np.random.Generator, s: int = 256,
    geometries: Tuple[int, ...] = _TRAIN_GEOMETRIES,
    scale_range: Tuple[float, float] = (0.70, 1.15),
) -> Tuple[np.ndarray, np.ndarray]:
    """Random posed HU rendering of a REAL patient-derived geometry.

    The remaining OOD failure modes are anatomy-layout-shaped (whole
    muscle groups to background, pose-dependent lung proposal misses)
    and five phantom-side training levers closed as nulls — the missing
    ingredient is real anatomy layout, which the reference embeds as six
    trial polygon sets. This stream renders the four TRAINING geometries
    under the serving-pose family (same bounds as the posed OOD eval:
    tilt <=0.45 rad, mirror, zoom, shifts) with per-sample tissue-HU
    jitter (drawn inside the pseudo-labeler's HU_RANGES so labels stay
    exact) and rich-level noise. Returns (hu (s, s) f32, body u8) — the
    same contract as thorax_phantom_hu, so samples flow through the
    identical pseudo-label -> instance-target path."""
    from ..geometry import rasterize_polygons

    gid = geometries[int(rng.integers(len(geometries)))]
    polys = _train_geometry_polygons(gid)
    angle = rng.uniform(-0.45, 0.45)
    flip = rng.random() < 0.5
    # native fill of trials 2-5 is ~0.57 linear; the default zoom spans
    # the serving family both ways (the fixture-eval family zooms
    # 0.65-0.95 around a ~0.82-fill anatomy). Reaching trial 1's native
    # 0.82 frame fill from a 0.57-fill source needs scale ~1.45 — the
    # scale_range knob exists to probe that frame-filling end.
    scale = rng.uniform(*scale_range) * (s / 512.0)
    shift = rng.uniform(-0.06, 0.06, 2) * s
    ca, sa = np.cos(angle), np.sin(angle)
    rot = np.array([[ca, sa], [-sa, ca]])
    sgn = np.array([-1.0, 1.0]) if flip else np.array([1.0, 1.0])
    c0, c1 = 256.0, s / 2.0
    ordered = [
        (cid, (((xy - c0) * sgn) @ rot) * scale + c1 + shift)
        for z in (4, 3, 1, 2, 0) for cid, xy in polys if cid == z
    ]
    lab = rasterize_polygons(ordered, (s, s), background=-1)
    # per-sample HU jitter, each tissue inside its HU_RANGES window
    # (pseudo_label.py): the labeler-independence probe perturbs these
    # cut points +-10%, so training must not depend on exact values
    hu_vals = {
        0: rng.uniform(150.0, 500.0),   # bone  [70, 800]
        1: rng.uniform(20.0, 45.0),     # muscle [1, 50]
        2: rng.uniform(-900.0, -600.0),  # lung  [-1100, -200]
        3: rng.uniform(-120.0, -40.0),  # fat   [-150, -1]
    }
    hu = np.full((s, s), _HU["air"], np.float32)
    for cid, val in {**hu_vals, 4: hu_vals[3]}.items():
        hu[lab == cid] = val
    hu += rng.normal(0.0, rng.uniform(8.0, 20.0), hu.shape).astype(
        np.float32
    )
    return hu, ((lab >= 0) * 255).astype(np.uint8)


def _instances_from_labels(
    labels: np.ndarray, max_instances: int, mask_res: int = None
):
    """Label image -> (boxes (I,4), classes (I,), masks (I,r,r), valid).

    Mask targets are AREA-AVERAGED down to ``mask_res`` (default h/4, the
    proto resolution) — soft [0,1] values instead of nearest subsampling,
    so thin structures (rib cross-sections, the fat ring) always leave
    signal in the target instead of aliasing away entirely."""
    from scipy import ndimage

    h, w = labels.shape
    r = mask_res or h // 4
    f = h // r
    out_boxes, out_cls, out_masks = [], [], []
    for cid in range(4):
        mask = labels == cid
        if not mask.any():
            continue
        lab, n = ndimage.label(mask)
        sizes = ndimage.sum(mask, lab, np.arange(1, n + 1))
        for k in np.argsort(sizes)[::-1]:
            if sizes[k] < 16:
                continue
            inst = lab == (k + 1)
            ys, xs = np.nonzero(inst)
            out_boxes.append(
                [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
            )
            out_cls.append(cid)
            soft = inst[: r * f, : r * f].reshape(r, f, r, f).mean((1, 3))
            out_masks.append(soft.astype(np.float32))
    order = np.argsort(
        [-(b[2] - b[0]) * (b[3] - b[1]) for b in out_boxes]
    )[:max_instances]
    I = max_instances
    boxes = np.zeros((I, 4), np.float32)
    classes = np.zeros((I,), np.int32)
    masks = np.zeros((I, r, r), np.float32)
    valid = np.zeros((I,), bool)
    for j, k in enumerate(order):
        boxes[j] = out_boxes[k]
        classes[j] = out_cls[k]
        masks[j] = out_masks[k]
        valid[j] = True
    return boxes, classes, masks, valid


def phantom_batch(
    batch: int,
    imgsz: int = 256,
    max_instances: int = 12,
    rng: np.random.Generator = None,
    return_labels: bool = False,
    rich: bool = False,
    mask_res: int = None,
    store_u8: bool = False,
    anatomy_frac: float = 0.0,
    pv_sigma_max: float = 0.0,
    wide_pose: bool = False,
    geometry_frac: float = 0.0,
    geometry_scale: Tuple[float, float] = (0.70, 1.15),
) -> Dict[str, np.ndarray]:
    """Training batch from HU phantoms pseudo-labeled on device.

    ``mask_res`` sets the mask-target resolution (default imgsz/4 = proto
    res; imgsz/2 gives the higher-res supervision the trainer upsamples
    the proto to). ``store_u8`` keeps images and soft masks quantized to
    uint8 — 1/4 the host RAM and host->device bytes; the trainer
    dequantizes inside the compiled step. ``anatomy_frac`` draws that
    fraction of samples from the discrete-instance anatomy layout (many
    separate muscle/bone instances — the real fixture's statistics);
    such samples need a larger ``max_instances`` budget (~40) or the
    small-instance tail silently becomes background.

    ``pv_sigma_max`` > 0 applies a per-sample partial-volume blur (sigma
    ~ U(0, pv_sigma_max) px, skipped below 0.15 so the crisp end stays
    exactly in-distribution) to the IMAGE only — labels stay computed
    from the crisp HU map (see _partial_volume). The sigmas come from a
    dedicated constant-seeded rng so the main phantom stream is
    untouched: a pv batch contains the SAME phantoms and targets as the
    unblurred batch of the same seed, images blurred."""
    rng = rng or np.random.default_rng(0)
    # dedicated stream: sigma draws must not interleave with (and shift)
    # the phantom stream, so pv batches stay phantom-identical to
    # unblurred batches of the same seed
    pv_rng = np.random.default_rng(0x9D5) if pv_sigma_max else None
    r = mask_res or imgsz // 4
    im_dt = np.uint8 if store_u8 else np.float32
    images = np.zeros((batch, imgsz, imgsz, 3), im_dt)
    I = max_instances
    boxes = np.zeros((batch, I, 4), np.float32)
    classes = np.zeros((batch, I), np.int32)
    masks = np.zeros((batch, I, r, r), np.uint8 if store_u8 else np.float32)
    valid = np.zeros((batch, I), bool)
    label_imgs = np.zeros((batch, imgsz, imgsz), np.int32)
    for b in range(batch):
        # ``geometry_frac`` draws that fraction from posed renderings of
        # the REAL patient-derived training geometries (trials 2-5, see
        # geometry_slice_hu); streams with geometry_frac=0 are
        # bit-identical to before the flag existed (no extra rng draws)
        if geometry_frac and rng.random() < geometry_frac:
            hu, body = geometry_slice_hu(rng, imgsz,
                                         scale_range=geometry_scale)
        else:
            hu, body = thorax_phantom_hu(
                rng, imgsz, rich=rich,
                anatomy=bool(anatomy_frac and rng.random() < anatomy_frac),
                wide_pose=wide_pose,
            )
        labels = pseudo_label_slice(hu, body)
        # serving frame: window_normalize already applies the reference's
        # rot180 (classic_norm, utils.py:309), so the labels — computed in
        # the raw hu frame — must be rotated to match. (A previous extra
        # [::-1, ::-1] on the image CANCELLED the internal rot180 while the
        # labels kept theirs, so every training pair was misaligned by 180
        # degrees; the network compensated via its global receptive field,
        # predicting masks at the rot180 position of the anatomy it saw —
        # self-consistently on phantom evals, catastrophically on anything
        # else. tests/test_train.py::test_phantom_image_label_alignment
        # pins the frames together.)
        if pv_sigma_max:
            sig = float(pv_rng.uniform(0.0, pv_sigma_max))
            if sig > 0.15:
                hu = _partial_volume(hu, sig)
        img = np.asarray(window_normalize(hu, 40.0, 400.0))
        labels = labels[::-1, ::-1]
        img3 = np.repeat(img[..., None], 3, -1)
        images[b] = img3 if store_u8 else img3.astype(np.float32) / 255.0
        bx, cl, mk, vl = _instances_from_labels(labels, I, mask_res=r)
        boxes[b], classes[b], valid[b] = bx, cl, vl
        masks[b] = (
            np.round(mk * 255).astype(np.uint8) if store_u8 else mk
        )
        label_imgs[b] = labels
    out = {
        "images": images,
        "boxes": boxes,
        "classes": classes,
        "masks": masks,
        "valid": valid,
    }
    if return_labels:
        out["labels"] = label_imgs
    return out


def phantom_data_iter(
    batch: int, imgsz: int = 256, max_instances: int = 12, seed: int = 0
):
    rng = np.random.default_rng(seed)
    while True:
        yield phantom_batch(batch, imgsz, max_instances, rng)


# --- frontal rib-view phantoms (rib detector training) -------------------


def frontal_rib_phantom(
    rng: np.random.Generator, s: int = 640, n_pairs: int = None,
    hard: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synthetic frontal (coronal) CT view with rib bands.

    Mimics the reconstructed frontal slice the rib detector sees
    (utils.py:114-163: axial stack -> transpose -> min-max normalize):
    a torso band, a bright spine column, darker lung fields, and N rib
    pairs as tilted bright bands. Returns (image (s, s) uint8,
    boxes (2*N, 4) xyxy float32) — one box per rib instance.

    ``hard=True`` widens the distribution so the evaluation CAN fail:
    4-12 rib pairs, per-rib pitch jitter and dropped ribs (partial
    visibility), stronger tilts, low-contrast ribs (+25..+85 vs the
    fixed +85), noisier background. ``n_pairs=0`` produces a no-rib
    negative (empty box list).
    """
    if n_pairs is None:
        n_pairs = int(rng.integers(4, 13) if hard else rng.integers(8, 11))
    noise = rng.uniform(5, 14) if hard else 6.0
    img = rng.normal(18, noise, (s, s)).astype(np.float32)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    cx = s / 2 + rng.uniform(-s * 0.03, s * 0.03)
    half_w = s * rng.uniform(0.30, 0.38)
    torso = np.abs(xx - cx) < half_w
    img[torso] += 50 + rng.normal(0, 4, int(torso.sum()))
    # lung fields: darker panels either side of the spine
    for side in (-1, 1):
        lung = (np.abs(xx - (cx + side * half_w * 0.52)) < half_w * 0.42) & (
            yy > s * 0.12
        ) & (yy < s * 0.75)
        img[lung] -= 28
    # spine column
    spine = np.abs(xx - cx) < s * rng.uniform(0.025, 0.04)
    img[spine] += 70
    boxes = []
    y0 = s * rng.uniform(0.10, 0.16)
    pitch = s * rng.uniform(0.04, 0.09) if hard else s * rng.uniform(
        0.055, 0.075
    )
    contrast = rng.uniform(25, 85) if hard else 85.0
    drop_p = rng.uniform(0.0, 0.15) if hard else 0.0
    cy = y0
    for k in range(n_pairs):
        if k:
            cy += pitch * (rng.uniform(0.8, 1.25) if hard else 1.0)
        if cy > s * 0.9:
            break
        for side in (-1, 1):
            if drop_p and rng.random() < drop_p:
                continue  # partially visible cage: this rib is missing
            bx = cx + side * half_w * rng.uniform(0.45, 0.62)
            tilt = side * (rng.uniform(0.05, 0.45) if hard
                           else rng.uniform(0.12, 0.3))
            rx = half_w * rng.uniform(0.30, 0.42)
            ry = s * rng.uniform(0.008, 0.014)
            band = _ellipse(xx, yy, bx, cy, rx, ry, tilt)
            img[band] += contrast
            ys, xs = np.nonzero(band)
            if ys.size < 8:
                continue
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    img = np.clip(img, 0, 255)
    # min-max normalize like the pipeline's frontal slice
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6) * 255.0
    out_boxes = (
        np.asarray(boxes, np.float32) if boxes
        else np.zeros((0, 4), np.float32)
    )
    return img.astype(np.uint8), out_boxes


def rib_batch(
    batch: int,
    imgsz: int = 640,
    max_instances: int = 24,
    rng: np.random.Generator = None,
    return_boxes: bool = False,
    hard_frac: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Detect-only training batch for the rib model (class 0 = rib).

    Images stay uint8 (the trainer normalizes inside the jit — a 640^2 f32
    batch costs 4x the host->device bytes for nothing) and the unused mask
    targets are 1x1 placeholders (segment=False never reads them).
    ``hard_frac`` draws that fraction of samples from the widened (hard)
    distribution — mixed training for distribution-shift robustness."""
    rng = rng or np.random.default_rng(0)
    I = max_instances
    images = np.zeros((batch, imgsz, imgsz, 3), np.uint8)
    boxes = np.zeros((batch, I, 4), np.float32)
    classes = np.zeros((batch, I), np.int32)
    masks = np.zeros((batch, I, 1, 1), np.float32)
    valid = np.zeros((batch, I), bool)
    raw_boxes = []
    for b in range(batch):
        img, bx = frontal_rib_phantom(
            rng, imgsz, hard=bool(rng.random() < hard_frac)
        )
        images[b] = np.repeat(img[..., None], 3, -1)
        n = min(bx.shape[0], I)
        boxes[b, :n] = bx[:n]
        valid[b, :n] = True
        raw_boxes.append(bx)
    out = {
        "images": images,
        "boxes": boxes,
        "classes": classes,
        "masks": masks,
        "valid": valid,
    }
    if return_boxes:
        out["raw_boxes"] = raw_boxes
    return out
