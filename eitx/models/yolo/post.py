"""Detection decoding, fixed-size NMS, and instance-mask composition.

Static-shape formulation of the ultralytics inference tail: DFL box
regression -> anchor-relative xyxy decode -> class-agnostic-per-class NMS
with a fixed detection budget (max_det) -> sigmoid(coef @ proto) mask
composition cropped to boxes. Everything here is jit-able: no
data-dependent shapes, invalid slots are flagged, not dropped.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    """Fixed-size detections: slots beyond ``valid`` are padding."""

    boxes: jnp.ndarray  # (K, 4) xyxy in input pixels
    scores: jnp.ndarray  # (K,)
    classes: jnp.ndarray  # (K,) int32
    coefs: jnp.ndarray  # (K, nm) mask coefficients (zeros for detect-only)
    valid: jnp.ndarray  # (K,) bool


def _dfl(box_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution-focal decode: (..., 4*reg_max) -> (..., 4) expected
    distances in stride units."""
    shape = box_logits.shape[:-1]
    x = box_logits.reshape(*shape, 4, reg_max)
    p = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=p.dtype)
    return (p * bins).sum(-1)


def decode_detections(
    outputs: Dict, reg_max: int = 16, conf: float = 0.3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Raw per-level maps -> flat anchors.

    Returns (boxes (B, A, 4) xyxy px, scores (B, A), classes (B, A),
    coefs (B, A, nm)). conf is applied later by NMS (kept for signature
    compatibility)."""
    del conf
    levels = outputs["levels"]
    strides = outputs["strides"]
    mask_levels = outputs.get("mask_coefs")
    all_boxes, all_scores, all_classes, all_coefs = [], [], [], []
    for i, (box_map, cls_map) in enumerate(levels):
        B, H, W, _ = box_map.shape
        stride = strides[i]
        d = _dfl(box_map, reg_max)  # (B, H, W, 4) l,t,r,b
        xs = (jnp.arange(W, dtype=d.dtype) + 0.5)[None, None, :]
        ys = (jnp.arange(H, dtype=d.dtype) + 0.5)[None, :, None]
        x1 = (xs - d[..., 0]) * stride
        y1 = (ys - d[..., 1]) * stride
        x2 = (xs + d[..., 2]) * stride
        y2 = (ys + d[..., 3]) * stride
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(B, H * W, 4)
        probs = jax.nn.sigmoid(cls_map).reshape(B, H * W, -1)
        scores = probs.max(-1)
        classes = probs.argmax(-1).astype(jnp.int32)
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_classes.append(classes)
        if mask_levels is not None:
            nm = mask_levels[i].shape[-1]
            all_coefs.append(mask_levels[i].reshape(B, H * W, nm))
    # f32 outputs regardless of compute dtype (bf16 inference path)
    boxes = jnp.concatenate(all_boxes, axis=1).astype(jnp.float32)
    scores = jnp.concatenate(all_scores, axis=1).astype(jnp.float32)
    classes = jnp.concatenate(all_classes, axis=1)
    if all_coefs:
        coefs = jnp.concatenate(all_coefs, axis=1).astype(jnp.float32)
    else:
        coefs = jnp.zeros((*scores.shape, 1), jnp.float32)
    return boxes, scores, classes, coefs


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_det",))
def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    coefs: jnp.ndarray,
    conf: float = 0.3,
    iou_thresh: float = 0.45,
    max_det: int = 64,
) -> Detections:
    """Greedy per-class NMS over the top-K candidates (single image).

    K = 4 * max_det candidates enter; exactly max_det slots come out with a
    validity mask — fully static shapes.

    ``conf`` is a scalar (reference parity: one 0.3 threshold,
    ai_tools.py:129-158) or a per-class tuple — the serving-side recall
    lever for classes whose true instances sit just under the global
    threshold (round-3 OOD analysis: one missing lung recovers at 0.2).
    """
    k_in = min(4 * max_det, scores.shape[0])
    if isinstance(conf, (tuple, list)):
        thr = jnp.asarray(conf, scores.dtype)[classes]
        scores = jnp.where(scores >= thr, scores, 0.0)
    else:
        scores = jnp.where(scores >= conf, scores, 0.0)
    top_scores, idx = jax.lax.top_k(scores, k_in)
    top_boxes = boxes[idx]
    top_classes = classes[idx]
    top_coefs = coefs[idx]
    iou = _iou_matrix(top_boxes)
    same_class = top_classes[:, None] == top_classes[None, :]
    suppress_pair = (iou > iou_thresh) & same_class

    def body(i, keep):
        # candidate i survives if no higher-ranked kept box suppresses it
        killed = jnp.any(suppress_pair[i] & keep & (jnp.arange(k_in) < i))
        keep = keep.at[i].set(jnp.logical_not(killed) & (top_scores[i] > 0))
        return keep

    keep = jax.lax.fori_loop(0, k_in, body, jnp.zeros((k_in,), bool))
    # compact the kept boxes into the first max_det slots
    order = jnp.argsort(~keep, stable=True)  # kept first, rank preserved
    order = order[:max_det]
    valid = keep[order]
    return Detections(
        boxes=top_boxes[order] * valid[:, None],
        scores=top_scores[order] * valid,
        classes=jnp.where(valid, top_classes[order], -1),
        coefs=top_coefs[order] * valid[:, None],
        valid=valid,
    )


@functools.partial(jax.jit, static_argnames=("out_hw",))
def process_masks(
    proto: jnp.ndarray,
    det: Detections,
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """sigmoid(coef @ proto), cropped to each box, upsampled, binarized.

    proto (Hp, Wp, nm) single image; returns (K, H, W) bool instance masks
    (ultralytics ops.process_mask with upsample=True parity).
    """
    hp, wp, nm = proto.shape
    h, w = out_hw
    m = jnp.einsum(
        "kn,hwn->khw", det.coefs.astype(proto.dtype), proto
    )
    m = jax.nn.sigmoid(m)
    # crop at proto resolution
    sx, sy = wp / w, hp / h
    bx = det.boxes * jnp.array([sx, sy, sx, sy], proto.dtype)
    xs = jnp.arange(wp, dtype=proto.dtype)[None, None, :]
    ys = jnp.arange(hp, dtype=proto.dtype)[None, :, None]
    inside = (
        (xs >= bx[:, 0][:, None, None])
        & (xs < bx[:, 2][:, None, None])
        & (ys >= bx[:, 1][:, None, None])
        & (ys < bx[:, 3][:, None, None])
    )
    m = m * inside
    m = jax.image.resize(m, (m.shape[0], h, w), method="bilinear")
    return (m > 0.5) & det.valid[:, None, None]


def postprocess_detect(
    outputs: Dict,
    conf: float = 0.3,
    iou_thresh: float = 0.45,
    max_det: int = 64,
    reg_max: int = 16,
) -> Detections:
    """Batch decode + NMS: returns Detections with leading batch axis."""
    boxes, scores, classes, coefs = decode_detections(outputs, reg_max)

    def one(b, s, c, m):
        return nms_fixed(b, s, c, m, conf, iou_thresh, max_det)

    return jax.vmap(one)(boxes, scores, classes, coefs)


def postprocess_segment(
    outputs: Dict,
    input_hw: Tuple[int, int],
    conf: float = 0.3,
    iou_thresh: float = 0.45,
    max_det: int = 64,
    reg_max: int = 16,
) -> Tuple[Detections, jnp.ndarray]:
    """Batch detect + instance masks at input resolution."""
    det = postprocess_detect(outputs, conf, iou_thresh, max_det, reg_max)
    proto = outputs["proto"]  # (B, Hp, Wp, nm)

    def one(p, d):
        return process_masks(p, d, input_hw)

    masks = jax.vmap(one)(proto, det)
    return det, masks


@functools.partial(jax.jit, static_argnames=("input_hw", "out_hw"))
def compose_label_image(
    proto: jnp.ndarray,
    det: Detections,
    input_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Instance masks -> one (H, W) int32 label image, entirely on device.

    Avoids materializing max_det full-resolution masks on the host (the
    segmentation-throughput bottleneck): masks are composed at proto
    resolution in score order (highest score painted last, winning
    overlaps), and only the final label image is resized to ``out_hw``.
    ``input_hw`` is the network-input resolution the boxes live in —
    the box->proto crop scale must come from it, NOT from out_hw (scaling
    by out_hw left input-pixel boxes off the proto grid whenever a
    coarse output was requested, blanking every label). -1 background.
    """
    hp, wp, _ = proto.shape
    in_h, in_w = input_hw
    h, w = out_hw
    m = jax.nn.sigmoid(
        jnp.einsum("kn,hwn->khw", det.coefs.astype(proto.dtype), proto)
    )
    if (h, w) != (hp, wp):
        # quality path: bilinear-upsample the soft masks BEFORE the box
        # crop + 0.5 threshold (ultralytics process_mask upsample=True
        # semantics) — thin structures survive; the proto-res path would
        # quantize them to the 1/4 grid. Costs (K, h, w) memory: meant for
        # small batches / the per-request pipeline, not bulk throughput.
        m = jax.image.resize(m, (m.shape[0], h, w), method="bilinear")
    sx, sy = w / in_w, h / in_h
    bx = det.boxes * jnp.array([sx, sy, sx, sy], proto.dtype)
    xs = jnp.arange(w, dtype=proto.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=proto.dtype)[None, :, None]
    inside = (
        (xs >= bx[:, 0][:, None, None])
        & (xs < bx[:, 2][:, None, None])
        & (ys >= bx[:, 1][:, None, None])
        & (ys < bx[:, 3][:, None, None])
    )
    hit = (m > 0.5) & inside & det.valid[:, None, None]  # (K, h, w)
    order = jnp.argsort(det.scores)  # ascending: best painted last

    def body(i, lab):
        k = order[i]
        return jnp.where(hit[k], det.classes[k], lab)

    return jax.lax.fori_loop(
        0, det.scores.shape[0], body,
        jnp.full((h, w), -1, jnp.int32),
    )


def postprocess_segment_labels(
    outputs: Dict,
    input_hw: Tuple[int, int],
    conf: float = 0.3,
    iou_thresh: float = 0.45,
    max_det: int = 64,
    reg_max: int = 16,
    out_hw: Tuple[int, int] = None,
) -> Tuple[Detections, jnp.ndarray]:
    """Batch detect + composed (B, H, W) label images (device-side).

    ``input_hw`` is the network-input resolution (box coordinate frame);
    ``out_hw`` the label-image resolution (defaults to input_hw; the
    throughput path asks for proto resolution to cut d2h 16x).
    """
    det = postprocess_detect(outputs, conf, iou_thresh, max_det, reg_max)
    proto = outputs["proto"]
    out = out_hw or input_hw

    def one(p, d):
        return compose_label_image(p, d, input_hw, out)

    labels = jax.vmap(one)(proto, det)
    return det, labels
