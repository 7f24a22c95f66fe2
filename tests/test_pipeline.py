import base64
import io
import json
import zipfile

import numpy as np
import pytest

from eitx.core.config import PipelineConfig, SimulationConfig
from eitx.io.dicom import write_dicom
from eitx.io.images import to_png_bytes
from eitx.io.nifti import write_nifti
from eitx.pipeline import Pipeline
from eitx.models.yolo.post import Detections


def synth_labels(h=512, w=512):
    """Plausible tissue label image: fat ring, muscle, two lungs, bone."""
    yy, xx = np.mgrid[0:h, 0:w]
    lab = np.full((h, w), -1, dtype=np.int32)
    body = ((xx - 256) / 200.0) ** 2 + ((yy - 256) / 150.0) ** 2 < 1
    fat = ((xx - 256) / 195.0) ** 2 + ((yy - 256) / 145.0) ** 2 < 1
    mus = ((xx - 256) / 175.0) ** 2 + ((yy - 256) / 127.0) ** 2 < 1
    lab[fat] = 3
    lab[mus] = 1
    lungL = ((xx - 175) / 55.0) ** 2 + ((yy - 250) / 75.0) ** 2 < 1
    lungR = ((xx - 337) / 55.0) ** 2 + ((yy - 250) / 75.0) ** 2 < 1
    lab[lungL | lungR] = 2
    bone = ((xx - 256) / 22.0) ** 2 + ((yy - 330) / 18.0) ** 2 < 1
    lab[bone] = 0
    return lab, (body * 255).astype(np.uint8)


class StubSegmenter:
    imgsz = 512

    def predict_labels(self, image):
        lab, _ = synth_labels(*np.asarray(image).shape[:2])
        return lab, 0.01


class StubRibs:
    def predict(self, front):
        # 9 right-side ribs + 2 left, y spaced 30px
        boxes, n = [], 9
        for i in range(n):
            boxes.append([300.0, 20.0 + 30 * i, 330.0, 40.0 + 30 * i])
        boxes += [[40.0, 50.0, 70.0, 70.0], [40.0, 90.0, 70.0, 110.0]]
        boxes = np.array(boxes, dtype=np.float32)
        k = len(boxes)
        return Detections(
            boxes=boxes,
            scores=np.full((k,), 0.9, np.float32),
            classes=np.zeros((k,), np.int32),
            coefs=np.zeros((k, 1), np.float32),
            valid=np.ones((k,), bool),
        )


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    cfg = PipelineConfig(
        sim=SimulationConfig(n_points=4),
        results_dir=str(tmp_path_factory.mktemp("results")),
    )
    p = Pipeline.__new__(Pipeline)  # skip heavyweight model init
    p.config = cfg
    p.seg_512 = StubSegmenter()
    p._seg_256 = StubSegmenter()
    p.ribs = StubRibs()
    p._model_kw = {}
    return p


def _check_answer(ans, with_file=True):
    assert ans["status"] == "success"
    img = base64.b64decode(ans["image"])
    assert img[:8] == b"\x89PNG\r\n\x1a\n"
    # text_data carries the spacing-prefixed contour list (reference
    # create_answer's segmentation_results_cnt)
    crd = ans["text_data"]
    assert isinstance(crd, list) and len(crd) >= 3
    float(crd[0]); float(crd[1])
    assert all(line.split()[0].isdigit() for line in crd[2:])
    json.dumps(ans)  # whole answer must be JSON-serializable
    assert ans["segmentation_time"] >= 0
    assert ans["simulation_time"] > 0
    if with_file:
        import os

        assert ans["saved_file_name"] and os.path.exists(ans["saved_file_name"])
        rows = open(ans["saved_file_name"]).read().strip().split("\n")
        assert len(rows) == 4 * 12  # n_points * n_spir
        assert len(rows[0].split()) == 208


def _body_phantom_hu(h=512, w=512):
    """HU image: ellipse body at ~40 HU in -1000 air, lungs at -800."""
    yy, xx = np.mgrid[0:h, 0:w]
    hu = np.full((h, w), -1000.0)
    body = ((xx - 256) / 200.0) ** 2 + ((yy - 256) / 150.0) ** 2 < 1
    hu[body] = 40.0
    lung = ((xx - 175) / 55.0) ** 2 + ((yy - 250) / 75.0) ** 2 < 1
    hu[lung] = -800.0
    return hu


def test_jpg_png_mode(pipeline):
    lab, _ = synth_labels()
    img = (lab >= 0).astype(np.uint8) * 128
    ans = pipeline.run_jpg_png(img)
    _check_answer(ans)


def test_jpg_png_zip_mode(pipeline):
    img = ((synth_labels()[0] >= 0) * 128).astype(np.uint8)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("slice.png", to_png_bytes(img))
    buf.seek(0)
    ans = pipeline.run_jpg_png_zip(buf)
    _check_answer(ans)


def _dicom_zip(n_slices=3, series="9.9.9"):
    hu = _body_phantom_hu()
    px = (hu + 1024).astype(np.int16)  # intercept -1024
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n_slices):
            zf.writestr(
                f"{i}.dcm",
                write_dicom(px, series_uid=series, instance_number=i + 1,
                            rescale_intercept=-1024),
            )
    buf.seek(0)
    return buf


def test_dicom_frame_mode(pipeline):
    ans = pipeline.run_dicom_frame(_dicom_zip(1))
    _check_answer(ans)


def test_dicom_sequences_auto_mode(pipeline):
    ans = pipeline.run_dicom_sequences_auto(_dicom_zip(12))
    _check_answer(ans)


def test_dicom_sequences_custom_mode(pipeline):
    buf = _dicom_zip(12)
    # rebuild with custom_input
    src = zipfile.ZipFile(buf)
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for n in src.namelist():
            zf.writestr(n, src.read(n))
        zf.writestr("custom_input.txt", "1")
    out.seek(0)
    ans = pipeline.run_dicom_sequences_custom(out)
    _check_answer(ans)


def test_nii_mode(pipeline):
    hu = _body_phantom_hu(256, 256).astype(np.int16)
    vol = np.stack([hu] * 5, axis=-1)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("scan.nii.gz", write_nifti(vol, pixdim=(1, 0.7, 0.7, 1)))
    buf.seek(0)
    ans = pipeline.run_nii(buf)
    _check_answer(ans)


def test_body_polygon_prefers_max_area(pipeline):
    """A small jagged satellite with MORE vertices than the smooth body
    outline must not win the body-contour pick (utils.py:572-582 parity:
    the reference keeps the max-AREA external contour)."""
    mask = np.zeros((128, 128), np.uint8)
    yy, xx = np.mgrid[0:128, 0:128]
    # big smooth disk: few vertices after tracing
    mask[((xx - 48.0) ** 2 + (yy - 64.0) ** 2) < 30**2] = 255
    # small jagged comb artifact: many boundary vertices, tiny area
    for i in range(20):
        mask[40 + 2 * i, 100 + (i % 2) * 8 : 109 + (i % 2) * 8] = 255
    line = pipeline._body_polygon(mask)
    pts = np.array(line.split()[1:], float).reshape(-1, 2)
    cx, cy = pts.mean(axis=0)
    assert abs(cx - 48) < 8 and abs(cy - 64) < 8, (cx, cy)


def test_jpg_png_mode_with_trained_checkpoint(tmp_path):
    """Full real-model e2e when the in-repo trained checkpoint exists:
    phantom axial slice -> trained segmenter -> mesh -> EIT dataset."""
    import os

    from eitx.core.weights import find_checkpoint

    ckpt = find_checkpoint("tissue", 256)
    if ckpt is None:
        pytest.skip("no trained checkpoint in weights/")
    from eitx.core.config import ModelConfig
    from eitx.train.phantoms import phantom_batch

    cfg = PipelineConfig(
        model=ModelConfig(axial_weights_256=ckpt),
        sim=SimulationConfig(n_points=3),
        results_dir=str(tmp_path),
    )
    pipe = Pipeline(cfg)
    b = phantom_batch(1, 256, 12, np.random.default_rng(42))
    img = (b["images"][0, ..., 0] * 255).astype(np.uint8)
    ans = pipe.run_jpg_png(img)
    assert ans["status"] == "success"
    crd = ans["text_data"]
    classes_present = {line.split()[0] for line in crd[2:]}
    # trained model must produce multiple tissue classes on a phantom
    assert len(classes_present) >= 2, classes_present


def test_rib_detector_trained_checkpoint_selects_slice():
    """The committed rib-detector checkpoint must find ribs on a held-out
    frontal phantom and drive the between-ribs-6-and-7 slice-selection
    rule (reference utils.py:166-269) end to end."""
    import os

    from eitx.core.weights import find_checkpoint

    ckpt = find_checkpoint("ribs", 640)
    if ckpt is None:
        pytest.skip("no trained rib checkpoint in weights/")
    from eitx.models.yolo.infer import RibsDetector
    from eitx.select import select_axial_slice_number
    from eitx.train.phantoms import frontal_rib_phantom

    det = RibsDetector(weights=ckpt, imgsz=640, max_det=32)
    rng = np.random.default_rng(2024)
    img, gt = frontal_rib_phantom(rng, 640)
    d = det.predict(img)
    pred = d.boxes[d.valid]
    assert pred.shape[0] >= 7, f"only {pred.shape[0]} ribs detected"
    numbers = select_axial_slice_number(pred, 0, image_width=640)
    right = pred[pred[:, 0] > 320]
    ys = np.sort(right[:, 1])
    assert len(ys) >= 7
    # the selected row must land between sorted right-side ribs 6 and 7
    assert ys[5] <= numbers[-1] <= ys[6] + 1, (ys[5:7], numbers)
