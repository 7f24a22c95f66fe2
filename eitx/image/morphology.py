"""Binary morphology via XLA reduce_window (OpenCV morphologyEx parity).

The reference uses 3x3/5x5 rectangular kernels throughout
(utils.py:562,569,813; scripts). Erosion = min-pool, dilation = max-pool,
open = erode-then-dilate, close = dilate-then-erode. Works on (..., H, W)
boolean or {0,1} arrays; padding semantics match OpenCV's default
(constant border that never extends the foreground for dilation and always
erodes at the edge for erosion of BORDER_CONSTANT(0) masks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool(x: jnp.ndarray, k: int, op: str) -> jnp.ndarray:
    pad = k // 2
    x = jnp.asarray(x)
    nd = x.ndim
    window = (1,) * (nd - 2) + (k, k)
    strides = (1,) * nd
    padding = ((0, 0),) * (nd - 2) + (((pad, pad),) * 2)
    if op == "max":
        return jax.lax.reduce_window(
            x, False, jax.lax.bitwise_or, window, strides, padding
        )
    return jax.lax.reduce_window(
        x, True, jax.lax.bitwise_and, window, strides, padding
    )


@functools.partial(jax.jit, static_argnames=("k",))
def binary_dilate(mask, k: int = 3):
    return _pool(jnp.asarray(mask, bool), k, "max")


@functools.partial(jax.jit, static_argnames=("k",))
def binary_erode(mask, k: int = 3):
    return _pool(jnp.asarray(mask, bool), k, "min")


@functools.partial(jax.jit, static_argnames=("k",))
def binary_open(mask, k: int = 5):
    m = jnp.asarray(mask, bool)
    return _pool(_pool(m, k, "min"), k, "max")


@functools.partial(jax.jit, static_argnames=("k",))
def binary_close(mask, k: int = 5):
    m = jnp.asarray(mask, bool)
    return _pool(_pool(m, k, "max"), k, "min")
