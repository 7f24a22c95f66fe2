"""High-level detector / segmenter wrappers used by the pipeline.

Equivalent of the reference's ``_load_model`` / ``_ribs_predict`` /
``_axial_slice_predict`` (ai_tools.py:69-158), but batched and compiled:
preprocessing (grayscale->RGB, letterbox, /255) + network + decode + NMS +
mask composition is one jit program per (batch, imgsz) shape. Without a
checkpoint the wrappers run with randomly initialized weights (useful for
plumbing tests; real weights convert via convert.py).
"""

from __future__ import annotations

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
        proto_stride: int = 4,
        conf: float = 0.3,
        iou: float = 0.45,
        max_det: int = 64,
        seed: int = 0,
        dtype: str = "float32",
        tta_fill: bool = False,
    ):
        ckpt_tree = None
        if weights:
            # an eitx checkpoint records its own architecture: adopt its
            # size variant (loading 'n' weights into an 's' graph can only
            # fail) and refuse a class-count mismatch outright
            from ...core.errors import ModelError
            from .convert import peek_checkpoint_meta, restore_checkpoint_tree

            if not weights.endswith(".pt"):
                ckpt_tree = restore_checkpoint_tree(weights)
            meta = peek_checkpoint_meta(weights, tree=ckpt_tree)
            if meta.get("variant"):
                variant = str(meta["variant"])
            if meta.get("proto_stride"):
                proto_stride = int(meta["proto_stride"])
            if meta.get("nc") and int(meta["nc"]) != nc:
                raise ModelError(
                    f"checkpoint {weights} was trained with nc="
                    f"{meta['nc']}, runner expects nc={nc}"
                )
        self.spec = yolov11_spec(
            variant, nc=nc, segment=segment, proto_stride=proto_stride
        )
        self.model = YoloV11(self.spec)
        self.imgsz = imgsz
        if isinstance(conf, (tuple, list)) and len(conf) < nc:
            # a short tuple would be silently clamped by JAX's
            # out-of-bounds gather (class i >= len picks the last entry)
            from ...core.errors import ModelError

            raise ModelError(
                f"per-class conf has {len(conf)} entries, model has "
                f"{nc} classes"
            )
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        # flip test-time augmentation with background-fill-only merge:
        # the straight pass's labels always win; pixels it left
        # unlabeled (-1) take the first extra view's label (priority
        # order: hflip, then vflip). A monotone recall lever for
        # whole-group proposal misses (round-4 OOD adjudication: hflip
        # lifts posed lung 0.48->0.82 at 256 and crisp macro +0.05;
        # vflip recovers the one 512 pose hflip cannot, lung
        # 0.48->0.84) at n_views x device cost; off by default (the
        # reference has no TTA — ai_tools.py:129-158 is one forward
        # pass). ``tta_fill`` accepts False/True (1/2 views) or an
        # explicit view count (3 = +vflip, 4 = +rot180 — the view that
        # recovers the one 512 eval pose the single flips cannot).
        self.tta_views = (2 if tta_fill is True
                          else max(1, int(tta_fill or 1)))
        self.tta_fill = self.tta_views > 1
        self.compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        if weights:
            from .convert import load_weights

            self.variables = load_weights(
                weights, self.model, imgsz, tree=ckpt_tree
            )
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, imgsz, imgsz, 3), jnp.float32),
            )
        if self.compute_dtype == jnp.bfloat16:
            # bf16 inference: cast all float variables (weights AND batch
            # stats) so promotion never lifts activations back to f32 and
            # every conv hits the MXU at bf16 rate
            def to_bf16(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x.astype(jnp.bfloat16)
                return x

            self.variables = jax.tree_util.tree_map(to_bf16, self.variables)
        self._detect_fn = None
        self._segment_fn = None
        self._segment_labels_fn = None
        self._segment_labels_key = None

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

    def _build_segment_labels(self, in_hw, rgb: bool, full: bool = False):
        """Fully-fused throughput path: uint8 in, int8 labels out.

        Preprocessing (cast, /255, channel replication, letterbox) runs
        inside the jit so only the raw uint8 frames go host->device and
        only int8 label images come back — on relay-attached TPUs the
        transfer is the bottleneck, not the network."""
        model, variables = self.model, self.variables
        conf, iou, max_det = self.conf, self.iou, self.max_det
        imgsz = self.imgsz
        h, w = in_hw
        scale, pad_x, pad_y = letterbox_params(h, w, imgsz)
        nh, nw = int(round(h * scale)), int(round(w * scale))

        cdtype = self.compute_dtype
        tta_views = self.tta_views

        @jax.jit
        def run(x_u8):
            x = x_u8.astype(cdtype) / 255.0
            if not rgb:
                x = jnp.repeat(x[..., None], 3, axis=-1)
            b = x.shape[0]
            if (nh, nw) != (h, w):
                x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
            if (nh, nw) != (imgsz, imgsz):
                canvas = jnp.full(
                    (b, imgsz, imgsz, 3), 114.0 / 255.0, cdtype
                )
                x = jax.lax.dynamic_update_slice(canvas, x, (0, pad_y, pad_x, 0))
            if tta_views > 1:
                # extra flip views ride the same program as batch rows
                # [b:2b], [2b:3b]; flipping the LETTERBOXED canvas is
                # its own exact inverse on the label canvas (content
                # returns to the identical pixel window), so the merge
                # below needs no letterbox bookkeeping
                views = [x, x[:, :, ::-1]]
                if tta_views > 2:
                    views.append(x[:, ::-1])
                if tta_views > 3:
                    views.append(x[:, ::-1, ::-1])
                x = jnp.concatenate(views, axis=0)
            out = model.apply(variables, x, train=False)
            # throughput path composes at PROTO resolution (imgsz/4):
            # returning the coarse image cuts the device->host transfer
            # 16x (host does the nearest upsample). The quality path
            # (full=True, used per-request) bilinear-upsamples the soft
            # masks to full resolution BEFORE thresholding, so thin
            # structures keep sub-proto-cell boundaries.
            q = 1 if full else 4
            _, labels = postprocess_segment_labels(
                out, (imgsz, imgsz), conf, iou, max_det,
                out_hw=(imgsz // q, imgsz // q),
            )
            if tta_views > 1:
                lab = labels[:b]
                lab = jnp.where(lab < 0, labels[b:2 * b, :, ::-1], lab)
                if tta_views > 2:
                    lab = jnp.where(
                        lab < 0, labels[2 * b:3 * b, ::-1], lab
                    )
                if tta_views > 3:
                    lab = jnp.where(
                        lab < 0, labels[3 * b:4 * b, ::-1, ::-1], lab
                    )
                labels = lab
            return labels.astype(jnp.int8)

        return run

    def segment_labels(
        self, images: np.ndarray, chunk: int = 16, compose_full: bool = False
    ) -> np.ndarray:
        """uint8 (B, H, W[, 3]) -> (B, H, W) int32 label images.

        The batched-throughput path: network + NMS + mask composition +
        letterboxing all on device; uint8 crosses in, int8 crosses out.

        Large batches stream in ``chunk``-sized pieces: every chunk's
        host->device transfer, device program, and device->host label fetch
        are enqueued asynchronously, so the link (the bottleneck on
        relay-attached chips) stays busy while earlier chunks compute and
        the host upsamples already-fetched labels.

        ``compose_full`` switches to the quality path: masks are bilinear-
        upsampled to network resolution before thresholding (better thin-
        structure boundaries, (max_det, imgsz, imgsz) device memory per
        image) — meant for per-request inference, not bulk throughput."""
        arr = np.asarray(images)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        rgb = arr.ndim == 4
        h, w = arr.shape[1], arr.shape[2]
        key = (h, w, rgb, compose_full)
        if self._segment_labels_fn is None or self._segment_labels_key != key:
            self._segment_labels_fn = self._build_segment_labels(
                (h, w), rgb, full=compose_full
            )
            self._segment_labels_key = key
        fn = self._segment_labels_fn
        b = arr.shape[0]
        if b <= chunk:
            pieces_dev = [fn(jnp.asarray(arr))]
        else:
            pad = (-b) % chunk  # one compiled shape: pad the ragged tail
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            pieces_dev = []
            for k in range(0, arr.shape[0], chunk):
                x = jax.device_put(arr[k : k + chunk])  # async h2d
                pieces_dev.append(fn(x))  # async dispatch
        for o in pieces_dev:
            # start EVERY chunk's device->host copy before consuming any:
            # on relay links the d2h RPC is driven while the host is busy
            # upsampling earlier chunks, instead of serializing behind it
            try:
                o.copy_to_host_async()
            except AttributeError:  # non-jax array (tests/mocks)
                pass
        out = np.empty((b, h, w), np.int32)
        done = 0
        for o in pieces_dev:
            coarse = np.asarray(o)  # blocks for THIS chunk only
            n = min(coarse.shape[0], b - done)
            self._upsample_labels_into(
                out[done : done + n], coarse[:n],
                q=1 if compose_full else 4,
            )
            done += n
        return out

    def _upsample_labels_into(
        self, out: np.ndarray, coarse: np.ndarray, q: int = 4
    ):
        """Un-letterbox + nearest-upsample labels at stride ``q`` directly
        into ``out`` (B, h, w). The integer-scale fast path is a SINGLE
        broadcast write (reshape view of out), with the int8->int32 cast
        fused — chained .repeat() would materialize an intermediate and
        make two passes, and this host work races the d2h RPC pump for
        the one CPU core on relay-attached chips."""
        n, h, w = out.shape
        scale, pad_x, pad_y = letterbox_params(h, w, self.imgsz)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        coarse = coarse[:, pad_y // q : (pad_y + nh) // q,
                        pad_x // q : (pad_x + nw) // q]
        ch, cw = coarse.shape[1], coarse.shape[2]
        if h == ch * q and w == cw * q:
            view = out.reshape(n, ch, q, cw, q)
            view[:] = coarse[:, :, None, :, None]
            return
        yy = np.minimum((np.arange(h) * ch // h), ch - 1)
        xx = np.minimum((np.arange(w) * cw // w), cw - 1)
        out[:] = coarse[:, yy][:, :, xx]

    def _upsample_labels(self, coarse: np.ndarray, h: int, w: int, q: int = 4):
        """Un-letterbox + nearest upsample labels at stride ``q`` to (h, w)."""
        out = np.empty((coarse.shape[0], h, w), np.int32)
        self._upsample_labels_into(out, coarse, q)
        return out

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
        cv2.add produces undefined colors on overlap — utils.py:519).
        Per-request latency is compute-light, so the quality composition
        (full-resolution soft-mask upsample before threshold) is used."""
        t0 = time.time()
        labels = self.segment_labels(
            np.asarray(axial_slice)[None], compose_full=True
        )[0]
        return labels, round(time.time() - t0, 3)
