"""Detection / segmentation losses (YOLO-style, jit-able, static shapes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete-IoU between xyxy boxes (..., 4); returns (...,)."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    w1 = jnp.clip(box1[..., 2] - box1[..., 0], 0)
    h1 = jnp.clip(box1[..., 3] - box1[..., 1], 0)
    w2 = jnp.clip(box2[..., 2] - box2[..., 0], 0)
    h2 = jnp.clip(box2[..., 3] - box2[..., 1], 0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    # enclosing box diagonal
    cw = jnp.maximum(box1[..., 2], box2[..., 2]) - jnp.minimum(
        box1[..., 0], box2[..., 0]
    )
    chh = jnp.maximum(box1[..., 3], box2[..., 3]) - jnp.minimum(
        box1[..., 1], box2[..., 1]
    )
    c2 = cw**2 + chh**2 + eps
    cx1 = (box1[..., 0] + box1[..., 2]) / 2
    cy1 = (box1[..., 1] + box1[..., 3]) / 2
    cx2 = (box2[..., 0] + box2[..., 2]) / 2
    cy2 = (box2[..., 1] + box2[..., 3]) / 2
    rho2 = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    v = (4 / jnp.pi**2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def dfl_loss(
    box_logits: jnp.ndarray, target_dist: jnp.ndarray, reg_max: int
) -> jnp.ndarray:
    """Distribution focal loss: CE against the two bins bracketing the
    target distance. box_logits (..., 4, reg_max), target (..., 4)."""
    t = jnp.clip(target_dist, 0, reg_max - 1 - 1e-3)
    tl = jnp.floor(t).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(box_logits.dtype) - t
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    ll = jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, tr[..., None], axis=-1)[..., 0]
    return -(wl * ll + wr * lr).mean(-1)


def bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return optax_sigmoid_bce(logits, targets)


def optax_sigmoid_bce(logits, labels):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p
