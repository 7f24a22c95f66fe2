"""Hounsfield-unit transform and CT windowing as fused jit kernels.

Replaces the reference's per-pixel ``numpy.vectorize(get_hu)`` (hot spot #3,
utils.py:558) and classic_norm (utils.py:272-313). Both kernels broadcast
over arbitrary leading batch axes, so a whole slice stack converts in one
device launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def hu_transform(pixels, rescale_slope=1.0, rescale_intercept=0.0):
    """HU = slope * stored_pixel + intercept (DICOM tags 0028,1052/1053)."""
    return (
        jnp.asarray(pixels, jnp.float32) * rescale_slope + rescale_intercept
    )


@functools.partial(jax.jit, static_argnames=("rotate_180",))
def window_normalize(volume, window_level=40.0, window_width=400.0,
                     rotate_180=True):
    """CT window -> uint8 (classic_norm parity).

    Clips HU to [level - width//2, level + width//2], scales to [0, 255],
    casts to uint8, then rotates the image plane 180 degrees (the
    reference's cv2.ROTATE_180 step). Works on (..., H, W).
    """
    hu_min = window_level - window_width // 2
    hu_max = window_level + window_width // 2
    v = jnp.clip(jnp.asarray(volume, jnp.float32), hu_min, hu_max)
    v = ((v - hu_min) / (hu_max - hu_min) * 255.0).astype(jnp.uint8)
    if rotate_180:
        v = v[..., ::-1, ::-1]
    return v
