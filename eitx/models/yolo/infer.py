"""High-level detector / segmenter wrappers used by the pipeline.

Equivalent of the reference's ``_load_model`` / ``_ribs_predict`` /
``_axial_slice_predict`` (ai_tools.py:69-158), but batched and compiled:
preprocessing (grayscale->RGB, letterbox, /255) + network + decode + NMS +
mask composition is one jit program per (batch, imgsz) shape. Without a
checkpoint the wrappers run with randomly initialized weights (useful for
plumbing tests; real weights convert via convert.py).
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import YoloV11, yolov11_spec
from .post import (
    Detections,
    postprocess_detect,
    postprocess_segment,
    postprocess_segment_labels,
)


def letterbox_params(h: int, w: int, imgsz: int) -> Tuple[float, int, int]:
    """scale, pad_x, pad_y to fit (h, w) into (imgsz, imgsz)."""
    scale = min(imgsz / h, imgsz / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pad_y = (imgsz - nh) // 2
    pad_x = (imgsz - nw) // 2
    return scale, pad_x, pad_y


def _prep_batch(images: np.ndarray, imgsz: int) -> Tuple[jnp.ndarray, float, int, int]:
    """uint8 (B, H, W) or (B, H, W, 3) -> letterboxed f32 (B, s, s, 3)."""
    arr = np.asarray(images)
    if arr.ndim == 3:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    b, h, w, _ = arr.shape
    scale, pad_x, pad_y = letterbox_params(h, w, imgsz)
    x = jnp.asarray(arr, jnp.float32) / 255.0
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) != (h, w):
        x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    canvas = jnp.full((b, imgsz, imgsz, 3), 114.0 / 255.0, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, x, (0, pad_y, pad_x, 0))
    return canvas, scale, pad_x, pad_y


class YoloRunner:
    """Shared machinery: build/init/convert + compiled apply."""

    def __init__(
        self,
        nc: int,
        imgsz: int,
        segment: bool,
        weights: Optional[str] = None,
        variant: str = "s",
        conf: float = 0.3,
        iou: float = 0.45,
        max_det: int = 64,
        seed: int = 0,
    ):
        self.spec = yolov11_spec(variant, nc=nc, segment=segment)
        self.model = YoloV11(self.spec)
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        if weights:
            from .convert import load_weights

            self.variables = load_weights(weights, self.model, imgsz)
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, imgsz, imgsz, 3), jnp.float32),
            )
        self._detect_fn = None
        self._segment_fn = None
        self._segment_labels_fn = None

    def _build_detect(self):
        model, variables = self.model, self.variables
        conf, iou, max_det = self.conf, self.iou, self.max_det

        @jax.jit
        def run(x):
            out = model.apply(variables, x, train=False)
            return postprocess_detect(out, conf, iou, max_det)

        return run

    def _build_segment(self):
        model, variables = self.model, self.variables
        conf, iou, max_det = self.conf, self.iou, self.max_det
        hw = (self.imgsz, self.imgsz)

        @jax.jit
        def run(x):
            out = model.apply(variables, x, train=False)
            return postprocess_segment(out, hw, conf, iou, max_det)

        return run

    def _build_segment_labels(self):
        model, variables = self.model, self.variables
        conf, iou, max_det = self.conf, self.iou, self.max_det
        hw = (self.imgsz, self.imgsz)

        @jax.jit
        def run(x):
            out = model.apply(variables, x, train=False)
            return postprocess_segment_labels(out, hw, conf, iou, max_det)

        return run

    def segment_labels(self, images: np.ndarray) -> np.ndarray:
        """uint8 (B, H, W[, 3]) -> (B, H, W) int32 label images.

        The whole network + NMS + mask composition stays on device; only
        the composed label image crosses to the host — this is the
        batched-throughput path (>> segment() which materializes every
        instance mask)."""
        arr = np.asarray(images)
        b, h, w = arr.shape[0], arr.shape[1], arr.shape[2]
        x, scale, pad_x, pad_y = _prep_batch(arr, self.imgsz)
        if self._segment_labels_fn is None:
            self._segment_labels_fn = self._build_segment_labels()
        _, labels = self._segment_labels_fn(x)
        lab = np.asarray(labels)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        lab = lab[:, pad_y : pad_y + nh, pad_x : pad_x + nw]
        if (nh, nw) != (h, w):
            yy = (np.arange(h) * nh / h).astype(int)
            xx = (np.arange(w) * nw / w).astype(int)
            lab = lab[:, yy][:, :, xx]
        return lab

    def detect(self, images: np.ndarray) -> Detections:
        """uint8 (B, H, W[, 3]) -> Detections in ORIGINAL image coords."""
        arr = np.asarray(images)
        h, w = arr.shape[1], arr.shape[2]
        x, scale, pad_x, pad_y = _prep_batch(arr, self.imgsz)
        if self._detect_fn is None:
            self._detect_fn = self._build_detect()
        det = self._detect_fn(x)
        boxes = (
            np.asarray(det.boxes) - np.array([pad_x, pad_y, pad_x, pad_y])
        ) / scale
        boxes = boxes * np.asarray(det.valid)[..., None]
        return Detections(
            boxes=boxes,
            scores=np.asarray(det.scores),
            classes=np.asarray(det.classes),
            coefs=np.asarray(det.coefs),
            valid=np.asarray(det.valid),
        )

    def segment(self, images: np.ndarray):
        """uint8 (B, H, W[, 3]) -> (Detections, masks (B, K, H, W) bool),
        both mapped back to the original resolution."""
        arr = np.asarray(images)
        b, h, w = arr.shape[0], arr.shape[1], arr.shape[2]
        x, scale, pad_x, pad_y = _prep_batch(arr, self.imgsz)
        if self._segment_fn is None:
            self._segment_fn = self._build_segment()
        det, masks = self._segment_fn(x)
        boxes = (
            np.asarray(det.boxes) - np.array([pad_x, pad_y, pad_x, pad_y])
        ) / scale
        boxes = boxes * np.asarray(det.valid)[..., None]
        det = Detections(
            boxes=boxes,
            scores=np.asarray(det.scores),
            classes=np.asarray(det.classes),
            coefs=np.asarray(det.coefs),
            valid=np.asarray(det.valid),
        )
        m = np.asarray(masks)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        m = m[:, :, pad_y : pad_y + nh, pad_x : pad_x + nw]
        if (nh, nw) != (h, w):
            m = np.asarray(
                jax.image.resize(
                    jnp.asarray(m, jnp.float32), (b, m.shape[1], h, w),
                    method="nearest",
                )
            ).astype(bool)
        return det, m


class RibsDetector(YoloRunner):
    """Single-class rib detector, imgsz 640 conf 0.3 (ai_tools.py:107-127)."""

    def __init__(self, weights: Optional[str] = None, **kw):
        kw.setdefault("nc", 1)
        kw.setdefault("imgsz", 640)
        kw.setdefault("conf", 0.3)
        super().__init__(segment=False, weights=weights, **kw)

    def predict(self, front_slice: np.ndarray) -> Detections:
        img = np.asarray(front_slice)
        det = self.detect(img[None])
        return Detections(*(t[0] for t in det))


class TissueSegmenter(YoloRunner):
    """4-class tissue segmenter at 256 or 512 (ai_tools.py:129-158)."""

    def __init__(self, imgsz: int = 512, weights: Optional[str] = None, **kw):
        kw.setdefault("nc", 4)
        kw.setdefault("conf", 0.3)
        super().__init__(imgsz=imgsz, segment=True, weights=weights, **kw)

    def predict_labels(self, axial_slice: np.ndarray):
        """(H, W[, 3]) uint8 -> ((H, W) int32 label image, seg_time_s).

        Instances paint lowest-score-first on device so the highest
        confidence instance wins overlaps (the reference's saturating
        cv2.add produces undefined colors on overlap — utils.py:519)."""
        t0 = time.time()
        labels = self.segment_labels(np.asarray(axial_slice)[None])[0]
        return labels, round(time.time() - t0, 3)
