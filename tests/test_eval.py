import numpy as np

from eitx.eval import (
    confusion_counts,
    evaluate_dataset,
    mask_from_yolo_labels,
    pixel_metrics,
    print_results,
)
from eitx.eval.metrics import mean_mask_iou


def test_confusion_and_metrics_perfect():
    gt = np.zeros((10, 10), np.uint8)
    gt[2:6, 2:6] = 1  # class 0
    counts = confusion_counts(gt, gt)
    m = pixel_metrics(counts[0])
    assert m["iou"] == 1.0 and m["f1"] == 1.0 and m["accuracy"] == 1.0


def test_metrics_partial_overlap():
    gt = np.zeros((10, 10), np.uint8)
    pred = np.zeros((10, 10), np.uint8)
    gt[0:4, 0:4] = 1  # 16 px
    pred[2:6, 2:6] = 1  # 16 px, overlap 4 px
    m = pixel_metrics(confusion_counts(gt, pred)[0])
    assert np.isclose(m["iou"], 4 / 28)
    assert np.isclose(m["precision"], 4 / 16)
    assert np.isclose(m["recall"], 4 / 16)


def test_mask_from_yolo_labels(tmp_path):
    p = tmp_path / "img.txt"
    # class 1 square covering central quarter (normalized coords)
    p.write_text("1 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    mask = mask_from_yolo_labels(str(p), 40, 40)
    assert mask[20, 20] == 2  # class_id + 1
    assert mask[2, 2] == 0
    assert 150 < (mask == 2).sum() < 500


def test_missing_label_file_is_empty(tmp_path):
    mask = mask_from_yolo_labels(str(tmp_path / "nope.txt"), 8, 8)
    assert mask.sum() == 0


def test_evaluate_dataset_aggregates():
    gt = np.zeros((8, 8), np.uint8)
    gt[0:4] = 1
    pred = gt.copy()
    bad = np.zeros_like(gt)
    res = evaluate_dataset([(gt, pred), (gt, bad)])
    assert 0 < res[0]["iou"] < 1
    txt = print_results(res)
    assert "bone" in txt


def test_mean_mask_iou():
    a = np.zeros((10, 10), np.uint8)
    a[0:5] = 1
    assert mean_mask_iou(a, a) == 1.0
    b = np.zeros_like(a)
    assert mean_mask_iou(a, b) < 0.01


def test_harness_label_mapping_on_disk_fixture(tmp_path):
    """Real images/labels directory pair: a stub segmenter that predicts
    exactly the ground-truth regions must score IoU ~1.0 for every class —
    pinning the harness's (lab + 1) convention against the YOLO-label
    rasterizer (class_id + 1, 0 background). A mapping bug (off-by-one /
    swapped background) would crater these numbers."""
    import os

    import numpy as np

    from eitx.eval.harness import PixelLevelEvaluator
    from eitx.eval.metrics import mask_from_yolo_labels
    from eitx.io.images import to_png_bytes

    imgs = tmp_path / "images"
    labs = tmp_path / "labels"
    os.makedirs(imgs)
    os.makedirs(labs)
    h = w = 96
    # two images, all four classes as axis-aligned boxes in YOLO polygons
    polys = {
        0: (0.10, 0.10, 0.30, 0.30),  # bone
        1: (0.40, 0.10, 0.60, 0.30),  # muscles
        2: (0.10, 0.50, 0.30, 0.80),  # lung
        3: (0.50, 0.50, 0.85, 0.85),  # fat
    }
    for name in ("a", "b"):
        (imgs / f"{name}.png").write_bytes(
            to_png_bytes(np.full((h, w), 90, np.uint8))
        )
        lines = []
        for cid, (x1, y1, x2, y2) in polys.items():
            lines.append(
                f"{cid} {x1} {y1} {x2} {y1} {x2} {y2} {x1} {y2}"
            )
        (labs / f"{name}.txt").write_text("\n".join(lines))

    gt = mask_from_yolo_labels(str(labs / "a.txt"), w, h)

    class EchoSegmenter:
        """Predicts the rasterized GT itself (internal -1..3 convention)."""

        def segment_labels(self, batch):
            return np.stack(
                [gt.astype(np.int32) - 1 for _ in range(batch.shape[0])]
            )

    ev = PixelLevelEvaluator(
        segmenter=EchoSegmenter(), images_dir=str(imgs), labels_dir=str(labs)
    )
    results = ev.evaluate()
    for cid in range(4):
        assert results[cid]["iou"] > 0.99, (cid, results[cid])
        assert results[cid]["f1"] > 0.99
