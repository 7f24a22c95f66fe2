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


def _external_mask(fg: jnp.ndarray) -> jnp.ndarray:
    """Pixels of components reachable from the image border — i.e. the
    components cv2.findContours(RETR_EXTERNAL) would return.

    A component nested inside a HOLE of another component is invisible to
    RETR_EXTERNAL; the reference's highlight_small_masks therefore never
    cleans fat/muscle specks enclosed by the anatomical fat/muscle rings
    (utils.py:803). Background floods 4-connected from the border
    (duality with 8-connected foreground), then external components are
    those 8-adjacent to the reached background."""
    bg = ~fg
    border = jnp.zeros_like(fg).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    reach = bg & border

    def grow4(x):
        return jax.lax.reduce_window(
            x, False, jax.lax.bitwise_or, (1, 3), (1, 1),
            ((0, 0), (1, 1)),
        ) | jax.lax.reduce_window(
            x, False, jax.lax.bitwise_or, (3, 1), (1, 1),
            ((1, 1), (0, 0)),
        )

    def body(state):
        reach, _ = state
        new = grow4(reach) & bg
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(lambda s: s[1], body, (reach, jnp.bool_(True)))
    # seed: foreground 8-adjacent to reached background (or on the border)
    touch = jax.lax.reduce_window(
        reach | border, False, jax.lax.bitwise_or, (3, 3), (1, 1),
        ((1, 1), (1, 1)),
    ) & fg

    # propagate the seed through whole components (8-connected)
    def body2(state):
        ext, _ = state
        new = jax.lax.reduce_window(
            ext, False, jax.lax.bitwise_or, (3, 3), (1, 1),
            ((1, 1), (1, 1)),
        ) & fg
        return new, jnp.any(new != ext)

    ext, _ = jax.lax.while_loop(lambda s: s[1], body2, (touch, jnp.bool_(True)))
    return ext


def _relabel_small(
    labels, fg, exclude_classes, min_size, fallback=MUSCLE,
    self_votes: bool = False, connectivity: int = 8,
    rect_quirk: bool = False, rect_cap: int = 64,
):
    """Relabel components of ``fg`` smaller than min_size to the majority
    3x3-neighbourhood class, excluding ``exclude_classes`` from the vote;
    fall back to ``fallback`` when no votes.

    ``self_votes=True`` reproduces the reference's clear_color_output
    vote exactly (utils.py:726-750): every pixel of the small component
    scans its 8 neighbours and counts ANY non-excluded pixel — including
    other pixels of the SAME component — so a 2+px component always
    out-votes its surroundings with its own colour and survives; only
    isolated 1-px specks (no non-excluded neighbours at all) fall back.
    ``self_votes=False`` is the saner variant used for the per-class
    tiny-region pass, where the component's own class is excluded anyway.
    """
    h, w = labels.shape
    comp = label_components(fg, connectivity=connectivity)
    flat_comp = comp.reshape(-1)
    ones = (flat_comp >= 0).astype(jnp.int32)
    sizes = jnp.zeros((h * w,), jnp.int32).at[jnp.maximum(flat_comp, 0)].add(ones)
    small = fg & (sizes[jnp.maximum(comp, 0)] < min_size)
    if rect_quirk:
        # cv2 CHAIN_APPROX_SIMPLE stores only run endpoints, so a filled
        # RECTANGLE has a <=4-point contour and the reference's
        # len(cnt) <= 5 rule fires on it at any size (utils.py:806-808).
        # Reproduce for bbox-filling components up to ``rect_cap`` px —
        # beyond that the quirk is a clear reference bug (it would erase
        # arbitrarily large rectangular regions) and is not copied.
        safe = jnp.maximum(flat_comp, 0)
        yy = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
        xx = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
        big = jnp.int32(1 << 30)
        off = jnp.where(flat_comp >= 0, 0, big)
        ymin = jnp.full((h * w,), big, jnp.int32).at[safe].min(yy + off)
        xmin = jnp.full((h * w,), big, jnp.int32).at[safe].min(xx + off)
        ymax = jnp.full((h * w,), -1, jnp.int32).at[safe].max(
            jnp.where(flat_comp >= 0, yy, -1)
        )
        xmax = jnp.full((h * w,), -1, jnp.int32).at[safe].max(
            jnp.where(flat_comp >= 0, xx, -1)
        )
        bbox = (ymax - ymin + 1) * (xmax - xmin + 1)
        rect = (bbox == sizes) & (sizes <= rect_cap)
        small = small | (fg & rect[jnp.maximum(comp, 0)])

    # per-pixel neighbour votes per class
    votes = []
    for c in range(N_CLASSES):
        if c in exclude_classes:
            votes.append(jnp.zeros((h, w), jnp.int32))
        else:
            src_mask = (labels == c) if self_votes else (
                (labels == c) & ~small
            )
            src = src_mask.astype(jnp.int32)
            counts = _window_count(src)
            if self_votes:
                # the reference scans the 8 NEIGHBOURS of each pixel —
                # the 3x3 window includes the centre, so subtract it
                counts = counts - src
            votes.append(counts)
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
        # 2. small non-muscle components -> majority neighbour, with the
        # reference's exact vote (self-votes included, 4-connected
        # components like scipy.ndimage.label): in effect only isolated
        # 1-px specks become muscle; larger specks keep their colour and
        # are left for the per-class pass below
        fg = (labels >= 0) & (labels != MUSCLE)
        labels = _relabel_small(
            labels, fg, exclude_classes=(MUSCLE,), min_size=min_component,
            self_votes=True, connectivity=4,
        )

    # 3. per-class tiny regions -> most common neighbour class.
    # The reference's highlight_small_masks keys are bone, muscle, fat and
    # AIR (utils.py:781-786) — lung is deliberately NOT cleaned, and the
    # air class does not exist in the 4-class palette, so the effective
    # set here is {bone, muscles, fat} (golden-tested against a faithful
    # re-implementation of the reference chain in tests/test_cv2_golden).
    out = labels
    for c in (0, 1, 3):  # bone, muscles, fat
        # RETR_EXTERNAL quirk: only components visible to the reference's
        # external-contour scan are candidates (specks enclosed inside a
        # same-class ring are never cleaned)
        fg = (out == c) & _external_mask(out == c)
        # reference keeps the original class when no valid neighbours
        out = _relabel_small(
            out, fg, exclude_classes=(c,), min_size=tiny_area + 1,
            fallback=c, rect_quirk=True,
        )
    return out
