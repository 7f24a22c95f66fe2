"""Connected components, largest-component and hole-fill on device.

The reference leans on OpenCV contour extraction + drawContours fill to
keep the largest body component (utils.py:572-582) and scipy.ndimage.label
for the mask-cleanup pass (utils.py:721). Here labeling runs as an XLA
fixpoint loop — one 3x3 label-propagation step followed by two
pointer-jumping steps per iteration, so convergence is O(log diameter)
rather than O(diameter) — and hole filling is a background flood from the
border. All static shapes; everything jit-compiled; batched variants via
vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _neighbor_max(
    lab: jnp.ndarray, mask: jnp.ndarray, connectivity: int = 8
) -> jnp.ndarray:
    """Neighbourhood max of labels over foreground (8- or 4-connected)."""
    nd = lab.ndim
    strides = (1,) * nd
    if connectivity == 8:
        window = (1,) * (nd - 2) + (3, 3)
        padding = ((0, 0),) * (nd - 2) + (((1, 1),) * 2)
        m = jax.lax.reduce_window(
            lab, jnp.int32(-1), jax.lax.max, window, strides, padding
        )
    else:  # 4-connected: plus-shaped neighbourhood via two 1-D windows
        m = jnp.maximum(
            jax.lax.reduce_window(
                lab, jnp.int32(-1), jax.lax.max,
                (1,) * (nd - 2) + (1, 3), strides,
                ((0, 0),) * (nd - 2) + ((0, 0), (1, 1)),
            ),
            jax.lax.reduce_window(
                lab, jnp.int32(-1), jax.lax.max,
                (1,) * (nd - 2) + (3, 1), strides,
                ((0, 0),) * (nd - 2) + ((1, 1), (0, 0)),
            ),
        )
    return jnp.where(mask, m, -1)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_components(
    mask: jnp.ndarray, connectivity: int = 8
) -> jnp.ndarray:
    """(H, W) bool -> (H, W) int32 labels (-1 background).

    Labels are root flat-indices: two pixels share a component iff their
    labels match. 8-connectivity by default (cv2.findContours semantics);
    ``connectivity=4`` matches scipy.ndimage.label's default (the
    reference's clear_color_output pass, utils.py:721).
    """
    mask = jnp.asarray(mask, bool)
    h, w = mask.shape[-2], mask.shape[-1]
    flat_ids = jnp.arange(h * w, dtype=jnp.int32).reshape(mask.shape[-2:])
    lab = jnp.where(mask, flat_ids, -1)

    def jump(lab):
        # label <- label of my label's pixel (pointer doubling)
        flat = lab.reshape(*lab.shape[:-2], h * w)
        j = jnp.take_along_axis(flat, jnp.maximum(flat, 0), axis=-1)
        j = jnp.where(flat >= 0, j, -1)
        return jnp.maximum(flat, j).reshape(lab.shape)

    def body(state):
        lab, _ = state
        new = _neighbor_max(lab, mask, connectivity)
        new = jump(jump(new))
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True)))
    return lab


@jax.jit
def largest_component(mask: jnp.ndarray) -> jnp.ndarray:
    """Keep only the largest 8-connected component of a boolean mask."""
    mask = jnp.asarray(mask, bool)
    h, w = mask.shape[-2], mask.shape[-1]
    lab = label_components(mask)
    flat = lab.reshape(-1)
    sizes = jnp.zeros((h * w,), jnp.int32).at[jnp.maximum(flat, 0)].add(
        (flat >= 0).astype(jnp.int32)
    )
    best = jnp.argmax(sizes)
    return lab == best


@jax.jit
def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill interior holes: anything not reachable from the border through
    background becomes foreground (drawContours(..., FILLED) parity for
    the outer contour)."""
    mask = jnp.asarray(mask, bool)
    bg = ~mask
    border = jnp.zeros_like(mask).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    reach = bg & border

    def body(state):
        reach, _ = state
        nd = reach.ndim
        strides = (1,) * nd
        # 4-connected flood: the foreground is 8-connected, so by duality
        # its holes are 4-connected background regions — an 8-connected
        # grow would escape through diagonal gaps the outer boundary
        # closes (cv2.drawContours-fill golden, tests/test_cv2_golden.py)
        pad_h = ((0, 0),) * (nd - 2) + ((0, 0), (1, 1))
        pad_v = ((0, 0),) * (nd - 2) + ((1, 1), (0, 0))
        grown = jax.lax.reduce_window(
            reach, False, jax.lax.bitwise_or,
            (1,) * (nd - 2) + (1, 3), strides, pad_h,
        ) | jax.lax.reduce_window(
            reach, False, jax.lax.bitwise_or,
            (1,) * (nd - 2) + (3, 1), strides, pad_v,
        )
        new = grown & bg
        return new, jnp.any(new != reach)

    reach, _ = jax.lax.while_loop(
        lambda s: s[1], body, (reach, jnp.bool_(True))
    )
    return mask | (bg & ~reach)


label_components_batch = jax.jit(jax.vmap(label_components))
largest_component_batch = jax.jit(jax.vmap(largest_component))
fill_holes_batch = jax.jit(jax.vmap(fill_holes))
