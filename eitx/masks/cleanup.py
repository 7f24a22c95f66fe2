"""Mask cleanup as one device program.

Replaces the reference's Python component loops (hot loop #4):
  - clear_color_output (utils.py:691-755): paint unlabeled pixels inside
    the body muscle-red, then relabel connected non-muscle components
    smaller than 5 px to the majority neighbour class (muscle when no
    neighbours).
  - highlight_small_masks (utils.py:758-843): per class, recolor tiny
    regions (the reference keys on contour length <= 5; here component
    area <= threshold, equivalent at these sizes) to the most common
    neighbouring class.

Everything runs as XLA ops over the (H, W) label image: connected
components via the pointer-jumping labeler, per-component statistics via
scatter-adds into flat (H*W, C) tables, neighbour votes via 3x3 counting
windows. Batched over slices with vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..image.cc import label_components

N_CLASSES = 5
MUSCLE = 1


def _window_count(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 sum (8-neighbourhood + self) of an int array."""
    nd = x.ndim
    window = (1,) * (nd - 2) + (3, 3)
    strides = (1,) * nd
    padding = ((0, 0),) * (nd - 2) + (((1, 1),) * 2)
    return jax.lax.reduce_window(
        x, jnp.int32(0), jax.lax.add, window, strides, padding
    )


def _relabel_small(labels, fg, exclude_classes, min_size, fallback=MUSCLE):
    """Relabel components of ``fg`` smaller than min_size to the majority
    3x3-neighbourhood class, excluding ``exclude_classes`` from the vote;
    fall back to ``fallback`` when no votes."""
    h, w = labels.shape
    comp = label_components(fg)  # (H, W) flat root ids, -1 outside
    flat_comp = comp.reshape(-1)
    ones = (flat_comp >= 0).astype(jnp.int32)
    sizes = jnp.zeros((h * w,), jnp.int32).at[jnp.maximum(flat_comp, 0)].add(ones)
    small = fg & (sizes[jnp.maximum(comp, 0)] < min_size)

    # per-pixel neighbour votes per class (large-region pixels only vote)
    votes = []
    for c in range(N_CLASSES):
        if c in exclude_classes:
            votes.append(jnp.zeros((h, w), jnp.int32))
        else:
            src = ((labels == c) & ~small).astype(jnp.int32)
            votes.append(_window_count(src))
    votes = jnp.stack(votes, axis=-1)  # (H, W, C)

    # aggregate votes per component
    comp_votes = jnp.zeros((h * w, N_CLASSES), jnp.int32)
    comp_votes = comp_votes.at[jnp.maximum(flat_comp, 0)].add(
        jnp.where(small.reshape(-1, 1), votes.reshape(-1, N_CLASSES), 0)
    )
    best = jnp.argmax(comp_votes, axis=1)  # (H*W,)
    has_votes = comp_votes.max(axis=1) > 0
    choice = jnp.where(has_votes, best, fallback).astype(labels.dtype)
    new = choice[jnp.maximum(flat_comp, 0)].reshape(h, w)
    return jnp.where(small, new, labels)


@functools.partial(jax.jit, static_argnames=("min_component", "tiny_area"))
def cleanup_labels(
    labels: jnp.ndarray,
    body_mask,
    min_component: int = 5,
    tiny_area: int = 5,
) -> jnp.ndarray:
    """Full cleanup pass on an (H, W) int32 label image.

    body_mask may be None (jpg_png mode skips the fill step, mirroring
    utils.py:1005 where clear_color_output is bypassed without a body
    mask) — pass None statically, not a traced value.
    """
    labels = jnp.asarray(labels, jnp.int32)

    if body_mask is not None:
        in_body = jnp.asarray(body_mask) > 0
        # 1. unlabeled inside the body -> muscle
        labels = jnp.where((labels < 0) & in_body, MUSCLE, labels)
        # 2. small non-muscle components -> majority neighbour
        fg = (labels >= 0) & (labels != MUSCLE)
        labels = _relabel_small(
            labels, fg, exclude_classes=(MUSCLE,), min_size=min_component
        )

    # 3. per-class tiny regions -> most common neighbour class
    out = labels
    for c in range(4):  # bone, muscles, lung, fat (reference's four keys)
        fg = out == c
        # reference keeps the original class when no valid neighbours
        out = _relabel_small(
            out, fg, exclude_classes=(c,), min_size=tiny_area + 1, fallback=c
        )
    return out
