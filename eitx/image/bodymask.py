"""Body mask extraction — one fused device kernel.

Reference behaviour (get_axial_slice_body_mask, utils.py:526-585):
threshold HU in (-500, 1000) -> 5x5 morphological open -> keep the
largest connected component -> fill it solid -> 0/255 uint8 mask. The
reference's per-pixel numpy.vectorize HU conversion (hot spot #3) and the
OpenCV contour round-trip collapse into one jit program here; the DICOM
variant's flipud quirk is a flag (the NIfTI variant skips it,
utils.py:588-618).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cc import fill_holes, largest_component
from .morphology import binary_open


@functools.partial(
    jax.jit, static_argnames=("open_kernel", "flipud")
)
def body_mask_from_hu(
    hu_img,
    hu_min: float = -500.0,
    hu_max: float = 1000.0,
    open_kernel: int = 5,
    flipud: bool = False,
) -> jnp.ndarray:
    """(H, W) HU image -> (H, W) uint8 {0, 255} body mask."""
    hu = jnp.asarray(hu_img, jnp.float32)
    if flipud:
        hu = hu[::-1, :]
    m = (hu > hu_min) & (hu < hu_max)
    m = binary_open(m, open_kernel)
    m = largest_component(m)
    m = fill_holes(m)
    return (m * jnp.uint8(255)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("open_kernel", "flipud"))
def body_mask_from_hu_batch(
    hu_stack,
    hu_min: float = -500.0,
    hu_max: float = 1000.0,
    open_kernel: int = 5,
    flipud: bool = False,
) -> jnp.ndarray:
    """(B, H, W) HU stack -> (B, H, W) uint8 masks in one program."""

    def one(im):
        return body_mask_from_hu(im, hu_min, hu_max, open_kernel, flipud)

    return jax.vmap(one)(hu_stack)
