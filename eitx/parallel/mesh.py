"""Device mesh construction.

The reference has no distributed runtime (SURVEY section 2.3): its scaling
mechanisms are multiprocessing pools. Here scaling is SPMD over a
jax.sharding.Mesh — the data axis carries subjects / slices / breathing
frames (embarrassingly parallel), the model axis shards parameters and
wide activations. On one host this is ICI; across hosts jax.distributed
initialization extends the same program over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_device_mesh(
    axes: Tuple[str, ...] = ("data", "model"),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Mesh over all (or the given) devices.

    Default shape puts every device on the data axis and 1 on the rest —
    the right default for this workload, where frames/subjects dominate.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)
