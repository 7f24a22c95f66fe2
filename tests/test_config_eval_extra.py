import numpy as np
import pytest

from eitx.core.toml_config import load_pipeline_config
from eitx.core.log import setup_logging
from eitx.eval.harness import PixelLevelEvaluator
from eitx.contours.formats import to_yolo_label


def test_toml_config_roundtrip(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text(
        """
results_dir = "out"
save_dataset = false

[image]
window_level = 50
window_width = 350

[sim]
n_points = 42
solver = "cholesky"

[classes]
compat_swap_lung_fat = true
"""
    )
    cfg = load_pipeline_config(str(p))
    assert cfg.image.window_level == 50
    assert cfg.sim.n_points == 42
    assert cfg.sim.solver == "cholesky"
    assert cfg.classes.compat_swap_lung_fat
    assert cfg.results_dir == "out" and not cfg.save_dataset
    # defaults untouched
    assert cfg.mesh.lc == 7.0


def test_toml_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[sim]\nbogus_key = 1\n")
    with pytest.raises(ValueError):
        load_pipeline_config(str(p))


def test_setup_logging_file(tmp_path):
    log = setup_logging(log_dir=str(tmp_path))
    log.info("hello world")
    for h in log.handlers:
        h.flush()
    content = (tmp_path / "eitx.log").read_text()
    assert "hello world" in content


class _PerfectSegmenter:
    """Returns the ground-truth label image (reads it from the fixture)."""

    def __init__(self, lab):
        self._lab = lab

    def segment_labels(self, images):
        return np.stack([self._lab] * images.shape[0])


def test_pixel_evaluator_perfect_model(tmp_path):
    from eitx.io.images import to_png_bytes

    h = w = 64
    lab = np.full((h, w), -1, np.int32)
    lab[10:30, 10:30] = 1
    lab[40:55, 40:55] = 2
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    img = ((lab >= 0) * 200).astype(np.uint8)
    (img_dir / "a.png").write_bytes(to_png_bytes(img))
    lines = [
        to_yolo_label(1, np.array([[10, 10], [29, 10], [29, 29], [10, 29]]),
                      (h, w)),
        to_yolo_label(2, np.array([[40, 40], [54, 40], [54, 54], [40, 54]]),
                      (h, w)),
    ]
    (lab_dir / "a.txt").write_text("\n".join(lines))
    ev = PixelLevelEvaluator(
        segmenter=_PerfectSegmenter(lab),
        images_dir=str(img_dir), labels_dir=str(lab_dir),
    )
    res = ev.evaluate()
    assert res[1]["iou"] > 0.85
    assert res[2]["iou"] > 0.85
    assert res[0]["iou"] == 0.0  # class never present
