"""HU-threshold pseudo-labeling dataset builder.

Parity with the reference's training-set builders
(scripts/create_femm_dataset.py): tissue masks from fixed HU ranges
(:757-762 — air [-1100,-200], bone [70,800], muscle [1,50], fat
[-150,-1]), per-tissue morphology (close for muscle, open for lung,
hole-fill for bone/muscle/lung), first-writer-wins composition into a
label image, then polygon extraction into YOLO segmentation label lines.
The per-pixel numpy.vectorize HU conversion and OpenCV passes become the
framework's device kernels, batched over whole slice stacks.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..contours.formats import to_yolo_label
from ..contours.simplify import approx_poly_dp
from ..contours.trace import arc_length, find_external_contours
from ..image.cc import fill_holes
from ..image.morphology import binary_close, binary_open

# (hu_min, hu_max) per tissue, reference create_femm_dataset.py:757-762.
HU_RANGES: Dict[str, Tuple[float, float]] = {
    "bone": (70.0, 800.0),
    "muscles": (1.0, 50.0),
    "lung": (-1100.0, -200.0),  # "air" range in the reference
    "fat": (-150.0, -1.0),
}
_CLASS_IDS = {"bone": 0, "muscles": 1, "lung": 2, "fat": 3}


def _ranges_array(hu_scale: float = 1.0) -> jnp.ndarray:
    """(4, 2) [lo, hi] rows in bone/muscles/lung/fat order, every bound
    scaled by ``hu_scale`` — the pseudo-labeler-independence probe: an
    eval ranking that survives the GT thresholds moving +-10% is not an
    artifact of the labeler's exact cut points."""
    return jnp.asarray(
        [[lo * hu_scale, hi * hu_scale]
         for lo, hi in (HU_RANGES["bone"], HU_RANGES["muscles"],
                        HU_RANGES["lung"], HU_RANGES["fat"])],
        jnp.float32,
    )


@jax.jit
def _tissue_label_kernel(
    hu: jnp.ndarray, body: jnp.ndarray, ranges: jnp.ndarray = None
) -> jnp.ndarray:
    """(H, W) HU + body mask -> (H, W) int32 labels (-1 background)."""
    inside = body > 0
    if ranges is None:
        ranges = _ranges_array()

    def rng(row):
        return (hu >= ranges[row, 0]) & (hu <= ranges[row, 1]) & inside

    bone = fill_holes(binary_open(rng(0), 3))
    muscles = fill_holes(binary_close(rng(1), 5))
    lung = fill_holes(binary_open(rng(2), 5))
    fat = rng(3)
    lab = jnp.full(hu.shape, -1, jnp.int32)
    # first-writer-wins in the reference's hu_ranges order (air, bone,
    # muscle, fat — create_femm_dataset.py:757-766), so the lung/air mask
    # claims its pixels before the muscle hole-fill swallows them
    lab = jnp.where(lung & (lab < 0), _CLASS_IDS["lung"], lab)
    lab = jnp.where(bone & (lab < 0), _CLASS_IDS["bone"], lab)
    lab = jnp.where(muscles & (lab < 0), _CLASS_IDS["muscles"], lab)
    lab = jnp.where(fat & (lab < 0), _CLASS_IDS["fat"], lab)
    return lab


def pseudo_label_slice(
    hu: np.ndarray, body_mask: np.ndarray, hu_scale: float = 1.0
) -> np.ndarray:
    if hu_scale == 1.0:
        return np.asarray(
            _tissue_label_kernel(
                jnp.asarray(hu, jnp.float32), jnp.asarray(body_mask)
            )
        )
    return np.asarray(
        _tissue_label_kernel(
            jnp.asarray(hu, jnp.float32), jnp.asarray(body_mask),
            _ranges_array(hu_scale),
        )
    )


def pseudo_label_stack(hu_stack: np.ndarray, body_masks: np.ndarray):
    """Batched variant: (B, H, W) in one program."""
    fn = jax.jit(jax.vmap(_tissue_label_kernel))
    return np.asarray(
        fn(jnp.asarray(hu_stack, jnp.float32), jnp.asarray(body_masks))
    )


def labels_to_yolo_lines(
    labels: np.ndarray, min_points: int = 3, epsilon_frac: float = 0.001
) -> List[str]:
    """Label image -> YOLO segmentation label lines (normalized coords)."""
    h, w = labels.shape
    lines = []
    for name, cid in _CLASS_IDS.items():
        mask = (labels == cid).astype(np.uint8)
        if not mask.any():
            continue
        for cnt in find_external_contours(mask, min_pixels=8):
            if cnt.shape[0] < min_points:
                continue
            eps = epsilon_frac * arc_length(cnt)
            approx = approx_poly_dp(cnt.astype(float), eps)
            if approx.shape[0] >= min_points:
                lines.append(to_yolo_label(cid, approx, (h, w)))
    return lines
