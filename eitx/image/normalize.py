"""Min-max normalization to uint8 (cv2.normalize NORM_MINMAX parity,
used for the frontal slice at ai_tools.py:101)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def minmax_normalize_u8(img) -> jnp.ndarray:
    x = jnp.asarray(img, jnp.float32)
    lo = x.min()
    hi = x.max()
    span = jnp.where(hi - lo == 0, 1.0, hi - lo)
    return jnp.round((x - lo) / span * 255.0).astype(jnp.uint8)
