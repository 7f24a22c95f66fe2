import io
import os
import zipfile

import numpy as np
import pytest

from eitx.scripts.pseudo_label import (
    HU_RANGES,
    labels_to_yolo_lines,
    pseudo_label_slice,
    pseudo_label_stack,
)
from eitx.scripts.build_datasets import build_axial_dataset, build_frontal_dataset
from eitx.io.dicom import write_dicom


def _phantom_hu(h=128, w=128):
    yy, xx = np.mgrid[0:h, 0:w]
    hu = np.full((h, w), -1000.0)
    body = ((xx - 64) / 50.0) ** 2 + ((yy - 64) / 40.0) ** 2 < 1
    hu[body] = 25.0  # muscle range
    fat = ((xx - 64) / 48.0) ** 2 + ((yy - 64) / 38.0) ** 2 >= 0.82
    hu[body & fat] = -80.0  # fat range
    lung = ((xx - 45) / 14.0) ** 2 + ((yy - 60) / 18.0) ** 2 < 1
    hu[lung] = -700.0
    bone = ((xx - 64) / 6.0) ** 2 + ((yy - 85) / 5.0) ** 2 < 1
    hu[bone] = 300.0
    mask = (body * 255).astype(np.uint8)
    return hu, mask


def test_pseudo_label_slice_classes():
    hu, mask = _phantom_hu()
    lab = pseudo_label_slice(hu, mask)
    assert lab[60, 45] == 2  # lung
    assert lab[85, 64] == 0  # bone
    assert lab[64, 64] == 1  # muscle
    assert lab[5, 5] == -1  # outside body
    # fat ring present
    assert (lab == 3).sum() > 50


def test_pseudo_label_stack_matches_single():
    hu, mask = _phantom_hu()
    stack = pseudo_label_stack(np.stack([hu, hu]), np.stack([mask, mask]))
    single = pseudo_label_slice(hu, mask)
    assert np.array_equal(stack[0], single)
    assert np.array_equal(stack[1], single)


def test_labels_to_yolo_lines():
    hu, mask = _phantom_hu()
    lab = pseudo_label_slice(hu, mask)
    lines = labels_to_yolo_lines(lab)
    assert lines
    cids = {int(l.split()[0]) for l in lines}
    assert 2 in cids and 1 in cids
    for line in lines:
        coords = list(map(float, line.split()[1:]))
        assert all(0.0 <= c <= 1.0 for c in coords)


def test_build_axial_dataset(tmp_path):
    hu, _ = _phantom_hu(128, 128)
    px = (hu + 1024).astype(np.int16)
    zp = tmp_path / "subj.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for i in range(2):
            zf.writestr(f"{i}.dcm",
                        write_dicom(px, "1.2.3", i + 1, rescale_intercept=-1024))
    out = tmp_path / "ds"
    n = build_axial_dataset([str(zp)], str(out))
    assert n == 2
    assert len(os.listdir(out / "images")) == 2
    labels = (out / "labels").iterdir()
    assert any(p.stat().st_size > 0 for p in labels)


def test_build_frontal_dataset(tmp_path):
    hu, _ = _phantom_hu(64, 64)
    px = (hu + 1024).astype(np.int16)
    zp = tmp_path / "subj.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for i in range(4):
            zf.writestr(f"{i}.dcm",
                        write_dicom(px, "1.2.3", i + 1, rescale_intercept=-1024))
    out = tmp_path / "front"
    n = build_frontal_dataset([str(zp)], str(out))
    assert n == 64  # one frontal image per column of the 64-wide volume
    assert len(os.listdir(out)) == 64


def test_build_nii_dataset(tmp_path):
    from eitx.io.nifti import write_nifti
    from eitx.scripts.build_datasets import build_nii_dataset

    hu, _ = _phantom_hu(96, 96)
    vol = np.stack([hu.astype(np.int16)] * 4, axis=-1)
    p = tmp_path / "scan.nii.gz"
    p.write_bytes(write_nifti(vol, pixdim=(1, 0.7, 0.7, 1)))
    out = tmp_path / "ds"
    n = build_nii_dataset([str(p)], str(out), stride=2)
    assert n == 2
    assert len(os.listdir(out / "images")) == 2
    spacing = (out / "scan_spacing.txt").read_text().split()
    assert abs(float(spacing[0]) - 0.7) < 1e-5
    labels = list((out / "labels").iterdir())
    assert any(pth.stat().st_size > 0 for pth in labels)


def test_train_tissue_init_from_warm_start(tmp_path):
    """--init-from restores EMA params + batch stats into a fresh Trainer
    (any imgsz — the net is fully convolutional)."""
    import jax
    from flax import serialization

    from eitx.train.trainer import TrainConfig, Trainer

    src = Trainer(TrainConfig(imgsz=64, variant="n", total_steps=2,
                              warmup_steps=0, max_instances=4))
    payload = {
        "params": jax.device_get(src.state.params),
        "batch_stats": jax.device_get(src.state.batch_stats),
        "meta": {"variant": "n", "imgsz": 64, "nc": 4},
    }
    ckpt = tmp_path / "warm.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(payload))

    # drive main() far enough to hit the warm-start branch cheaply
    from eitx.scripts.train_tissue import main

    report = main([
        "--steps", "1", "--batch", "2", "--imgsz", "32", "--n-train", "2",
        "--eval-n", "1", "--init-from", str(ckpt),
        "--out", str(tmp_path / "out.msgpack"),
    ])
    assert "macro_iou" in report
    # the saved deployment checkpoint must carry the warm-started meta
    from eitx.models.yolo.convert import peek_checkpoint_meta

    meta = peek_checkpoint_meta(str(tmp_path / "out.msgpack"))
    assert meta["imgsz"] == 32 and meta["mask_topk"] == 160


def test_devtools_split_and_polyline(tmp_path):
    """Dev-utility equivalents of the reference's scripts/label.py and
    scripts/cnt_draw.py."""
    from eitx.scripts.devtools import draw_polyline, split_yolo_dataset

    src = tmp_path / "src"
    (src / "images").mkdir(parents=True)
    (src / "labels").mkdir()
    for i in range(10):
        (src / "images" / f"s{i}.png").write_bytes(b"x")
        if i % 2 == 0:  # half the images have labels, half are negatives
            (src / "labels" / f"s{i}.txt").write_text("0 0.5 0.5 0.1 0.1")
    n_t, n_v = split_yolo_dataset(str(src), str(tmp_path / "dst"), 0.7)
    assert (n_t, n_v) == (7, 3)
    t_imgs = os.listdir(tmp_path / "dst" / "train" / "images")
    t_labs = os.listdir(tmp_path / "dst" / "train" / "labels")
    assert len(t_imgs) == 7 and len(t_labs) == 7  # negatives get empty txt
    # deterministic: same seed, same split
    n_t2, _ = split_yolo_dataset(str(src), str(tmp_path / "dst2"), 0.7)
    assert sorted(os.listdir(tmp_path / "dst2" / "train" / "images")) == \
        sorted(t_imgs)

    img = draw_polyline([10, 10, 50, 10, 50, 40], size=(64, 64))
    assert img.dtype == np.uint8 and img[10, 30] == 255 and img[25, 50] == 255
    assert img[30, 10] == 0


def test_devtools_lung_overlay(tmp_path):
    """scripts/test_lungmask.py equivalent: lung contours over a DICOM
    slice via eitx's own segmenter. lung_overlay refuses random weights
    (it would draw garbage contours), so drive it with the trained 256
    checkpoint — the net is fully convolutional, so it runs at imgsz=64;
    the test checks wiring, not quality."""
    from eitx.core.weights import find_checkpoint
    from eitx.io.dicom import write_dicom
    from eitx.scripts.devtools import lung_overlay

    ckpt = find_checkpoint("tissue", 256)
    if ckpt is None:
        pytest.skip("no trained tissue checkpoint in weights/")
    hu, _ = _phantom_hu(96, 96)
    px = (hu - (-1024.0)).astype(np.uint16)
    p = tmp_path / "s.dcm"
    p.write_bytes(write_dicom(px, series_uid="1.2.3", instance_number=1,
                              rescale_intercept=-1024.0, rescale_slope=1.0))
    overlay = lung_overlay(str(p), weights=ckpt, imgsz=64)
    assert overlay.shape == (96, 96, 3) and overlay.dtype == np.uint8
