"""Synthetic CT-like training batches.

Generates ellipse phantoms with per-instance boxes and masks in the YOLO
segmentation target format — the in-repo analogue of the reference's
HU-threshold pseudo-labeling dataset builders (scripts/create_femm_dataset
hu_ranges at :757-762), usable for trainer tests and multi-chip dry runs
without patient data.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def synthetic_ct_batch(
    batch: int = 2,
    imgsz: int = 256,
    max_instances: int = 8,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Returns dict(images (B,S,S,3) f32[0,1], boxes (B,I,4) xyxy px,
    classes (B,I) int32, masks (B,I,S/4,S/4) f32, valid (B,I) bool)."""
    rng = np.random.default_rng(seed)
    s = imgsz
    ms = imgsz // 4
    images = np.zeros((batch, s, s, 3), np.float32)
    boxes = np.zeros((batch, max_instances, 4), np.float32)
    classes = np.zeros((batch, max_instances), np.int32)
    masks = np.zeros((batch, max_instances, ms, ms), np.float32)
    valid = np.zeros((batch, max_instances), bool)
    yy, xx = np.mgrid[0:s, 0:s]
    for b in range(batch):
        # body
        img = rng.normal(0.05, 0.02, (s, s)).astype(np.float32)
        cx, cy = s / 2 + rng.uniform(-10, 10), s / 2 + rng.uniform(-10, 10)
        rx, ry = s * 0.4, s * 0.3
        body = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1
        img[body] = 0.45 + rng.normal(0, 0.02, body.sum())
        n_inst = rng.integers(2, max_instances // 2 + 1)
        for i in range(n_inst):
            cls = int(rng.integers(0, 4))
            icx = cx + rng.uniform(-rx * 0.5, rx * 0.5)
            icy = cy + rng.uniform(-ry * 0.5, ry * 0.5)
            irx = rng.uniform(s * 0.04, s * 0.12)
            iry = rng.uniform(s * 0.04, s * 0.12)
            blob = ((xx - icx) / irx) ** 2 + ((yy - icy) / iry) ** 2 < 1
            shade = {0: 0.95, 1: 0.55, 2: 0.15, 3: 0.35}[cls]
            img[blob] = shade + rng.normal(0, 0.02, blob.sum())
            boxes[b, i] = [icx - irx, icy - iry, icx + irx, icy + iry]
            classes[b, i] = cls
            # instance mask at proto resolution
            mby = blob[::4, ::4]
            masks[b, i] = mby.astype(np.float32)
            valid[b, i] = True
        images[b] = np.repeat(np.clip(img, 0, 1)[..., None], 3, axis=-1)
    return {
        "images": images,
        "boxes": boxes,
        "classes": classes,
        "masks": masks,
        "valid": valid,
    }
