"""OOD regression: serving checkpoints on the patient-derived fixture.

The tissue segmenter trains on synthetic phantoms; the only
patient-derived geometry in this environment is the segmented-slice
polygon set the reference embeds (femm_generator.py:748-829).
eitx/scripts/eval_ood_fixture.py renders it to an HU image and scores
the serving checkpoints against HU-threshold pseudo-labels — the eval
that exposed both round-3 training-data bugs (the rot180 frame
misalignment and the ellipse/scale prior: muscles scored 0.0 IoU and
one lung was missed entirely before the anatomy-instance phantom mode).

Ratchet protocol (round-4 verdict item): thresholds track the serving
checkpoints at measured - 0.07 — wide enough for seed noise (observed
seed spread ~+-0.01) and eval-kernel drift, tight enough that a
0.83 -> 0.65 collapse fails CI instead of passing silently. When a new
checkpoint is promoted, re-ratchet to its measured numbers - 0.07 in the
same commit. Measured baseline (weights/ood_fixture_report.json):
256 macro 0.7988 / muscles 0.7153 / lung 0.8738;
512 macro 0.8269 / muscles 0.7124 / fat 0.8845.
"""

import numpy as np
import pytest


def test_serving_256_on_patient_fixture():
    from eitx.core.weights import find_checkpoint
    from eitx.scripts.eval_ood_fixture import evaluate_ood

    ckpt = find_checkpoint("tissue", 256)
    if ckpt is None:
        pytest.skip("no trained 256 checkpoint in weights/")
    res = evaluate_ood(256, ckpt, seed=5)
    per = res["per_class_iou"]
    # round-5 geometry-stream checkpoint: measured 0.8006 - 0.07
    assert res["macro_iou"] >= 0.73, res
    # the two historical failure modes, ratcheted to measured - 0.07:
    assert per["muscles"] >= 0.64, (
        f"muscle head not firing on real anatomy layout again: {per}"
    )
    assert per["lung"] >= 0.87, (
        f"lung detection/box regression on frame-filling bodies: {per}"
    )


def test_serving_512_on_patient_fixture():
    from eitx.core.weights import find_checkpoint
    from eitx.scripts.eval_ood_fixture import evaluate_ood

    ckpt = find_checkpoint("tissue", 512)
    if ckpt is None:
        pytest.skip("no trained 512 checkpoint in weights/")
    res = evaluate_ood(512, ckpt, seed=5)
    per = res["per_class_iou"]
    # round-5 geometry-stream checkpoint: measured 0.8295 - 0.07
    assert res["macro_iou"] >= 0.76, res
    # the 512 slot's historical failure modes (pre-anatomy-mix serving
    # checkpoint: muscles 0.0, fat 0.43 at macro 0.446), ratcheted to
    # measured - 0.07:
    assert per["muscles"] >= 0.75, (
        f"muscle head not firing on real anatomy layout again: {per}"
    )
    assert per["fat"] >= 0.83, (
        f"fat regression on the patient-derived layout: {per}"
    )


def test_fixture_transform_renders_in_frame():
    """Re-posed fixture variants must keep the body inside the frame
    (the scale bound exists exactly for this) and still contain all four
    tissue classes."""
    from eitx.scripts.eval_ood_fixture import (
        fixture_transform, render_fixture_hu)
    from eitx.scripts.pseudo_label import pseudo_label_slice

    for k in range(4):
        t = fixture_transform(k)
        hu, body = render_fixture_hu(128, seed=5, transform=t)
        b = body > 0
        assert b.mean() > 0.15, f"transform {k} shrank the body away"
        # nothing clipped: the frame border stays air
        assert not b[0, :].any() and not b[-1, :].any()
        assert not b[:, 0].any() and not b[:, -1].any()
        gt = np.asarray(pseudo_label_slice(hu, body))
        present = set(np.unique(gt[gt >= 0]).tolist())
        assert present == {0, 1, 2, 3}, (k, present)
    # distinct seeds give distinct poses
    t0, t1 = fixture_transform(0), fixture_transform(1)
    assert t0["angle"] != t1["angle"]


def test_pseudo_labeler_hu_scale():
    """The labeler-independence probe's machinery: scale 1.0 is
    bit-identical to the standing labeler; +-10% threshold scaling moves
    only boundary pixels (same classes present, high agreement) — so a
    ranking flip under the probe indicts the labeler, not the probe."""
    from eitx.scripts.eval_ood_fixture import render_fixture_hu
    from eitx.scripts.pseudo_label import pseudo_label_slice

    hu, body = render_fixture_hu(128, seed=5)
    base = pseudo_label_slice(hu, body)
    same = pseudo_label_slice(hu, body, hu_scale=1.0)
    assert np.array_equal(base, same)
    for s in (0.9, 1.1):
        pert = pseudo_label_slice(hu, body, hu_scale=s)
        agree = float((pert == base).mean())
        assert 0.9 < agree < 1.0, (s, agree)
        assert set(np.unique(pert[pert >= 0])) == {0, 1, 2, 3}


def test_fixture_rendering_stats():
    """The rendered fixture itself: frame-filling body, two large lungs —
    the statistics the anatomy phantom mode was widened to cover."""
    from eitx.scripts.eval_ood_fixture import render_fixture_hu
    from eitx.scripts.pseudo_label import pseudo_label_slice

    hu, body = render_fixture_hu(256, seed=5)
    gt = pseudo_label_slice(hu, body)
    frac = float((np.asarray(gt) >= 0).mean())
    assert 0.6 < frac < 0.75, f"body fraction drifted: {frac}"
    lung = np.asarray(gt) == 2
    assert lung.mean() > 0.2, "lungs must dominate the fixture interior"


def test_serving_config_promotion_256():
    """The round-4 PROMOTED serving configuration (per-class conf +
    4-view TTA, ModelConfig defaults) on the fixture — ratcheted to the
    adjudicated numbers - 0.07 (sweep_tta4: crisp macro 0.8664,
    muscles 0.8084, lung 0.9432). The raw-checkpoint tests above pin
    the no-lever behavior; this one pins what Pipeline() actually
    serves."""
    from eitx.core.config import ModelConfig
    from eitx.core.weights import find_checkpoint
    from eitx.models.yolo.infer import TissueSegmenter
    from eitx.scripts.eval_ood_fixture import evaluate_ood

    ckpt = find_checkpoint("tissue", 256)
    if ckpt is None:
        pytest.skip("no trained 256 checkpoint in weights/")
    m = ModelConfig()
    assert m.axial_conf_per_class == (0.15, 0.05, 0.1, 0.15)
    assert m.axial_tta_fill == 4
    seg = TissueSegmenter(imgsz=256, weights=ckpt, variant="n",
                          max_det=m.max_detections,
                          conf=m.axial_conf_per_class,
                          tta_fill=m.axial_tta_fill)
    res = evaluate_ood(256, ckpt, seed=5, seg=seg)
    per = res["per_class_iou"]
    assert res["macro_iou"] >= 0.79, res
    assert per["muscles"] >= 0.73, per
    assert per["lung"] >= 0.87, per


def test_serving_config_promotion_512():
    """The promoted serving configuration at the 512 slot (crisp macro
    adjudicated 0.9014, muscles 0.8441, lung 0.9479 — sweep_tta4),
    ratcheted to measured - 0.07."""
    from eitx.core.config import ModelConfig
    from eitx.core.weights import find_checkpoint
    from eitx.models.yolo.infer import TissueSegmenter
    from eitx.scripts.eval_ood_fixture import evaluate_ood

    ckpt = find_checkpoint("tissue", 512)
    if ckpt is None:
        pytest.skip("no trained 512 checkpoint in weights/")
    m = ModelConfig()
    seg = TissueSegmenter(imgsz=512, weights=ckpt, variant="n",
                          max_det=m.max_detections,
                          conf=m.axial_conf_per_class,
                          tta_fill=m.axial_tta_fill)
    res = evaluate_ood(512, ckpt, seed=5, seg=seg)
    per = res["per_class_iou"]
    assert res["macro_iou"] >= 0.83, res
    assert per["muscles"] >= 0.77, per
    assert per["lung"] >= 0.87, per


def test_single_pass_posed_lung_ratchet():
    """The pose-dependent lung PROPOSAL miss is fixed in the single-pass
    network (round 5, real-geometry training stream) — not merely rescued
    by the TTA serving patch. Round 4 measured posed lung IoU 0.44-0.48
    at the worst poses in reference-parity mode (one lung proposed only
    by the rot180 TTA view); the promoted checkpoints measure 0.85-0.92
    at their worst poses. Ratcheted to measured - 0.07 on each slot's
    worst pose (256: pose 5, 512: pose 4)."""
    from eitx.core.weights import find_checkpoint
    from eitx.scripts.eval_ood_fixture import evaluate_ood, fixture_transform

    for size, pose, floor in ((256, 5, 0.78), (512, 4, 0.83)):
        ckpt = find_checkpoint("tissue", size)
        if ckpt is None:
            pytest.skip(f"no trained {size} checkpoint in weights/")
        res = evaluate_ood(size, ckpt, seed=5,
                           transform=fixture_transform(pose))
        assert res["per_class_iou"]["lung"] >= floor, (
            f"{size} single-pass posed lung regressed (the round-4 "
            f"proposal-miss failure mode): {res}"
        )
