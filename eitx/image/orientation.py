"""Slice-stack orientation handling.

Parity with the reference's convert_to_3d + axial_to_sagittal
(utils.py:73-163): axial slices stacked along the last axis, transposed to
a frontal ("sagittal-stack") view with orientation fixes driven by DICOM
PatientPosition (FFS/HFS), ImageOrientationPatient sign flips, and
PatientOrientation L/P flips. These are metadata-driven axis permutations,
kept as cheap array ops (jnp views; no copies until use).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def stack_axial_slices(pixel_arrays: Sequence[np.ndarray]) -> np.ndarray:
    """Stack per-slice arrays (sorted by caller) into (H, W, S)."""
    return np.stack(list(pixel_arrays), axis=-1)


def axial_stack_to_frontal(
    img_3d: np.ndarray,
    patient_position: str = "HFS",
    image_orientation: Optional[Sequence[float]] = None,
    patient_orientation: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """Axial (H, W, S) -> frontal view stack (S', H', W') with the
    reference's flip chain (utils.py:128-160 — treat each quirk as
    load-bearing; see SURVEY golden-test guidance)."""
    view = np.transpose(img_3d, (2, 1, 0))
    if patient_position == "FFS":
        view = np.flipud(view)
    # HFS and anything else: plain transpose.

    if image_orientation is not None and len(image_orientation) >= 6:
        row = np.asarray(image_orientation[:3], dtype=float)
        col = np.asarray(image_orientation[3:6], dtype=float)
        if row[0] == -1:
            view = np.flip(view, axis=1)
        if col[1] == -1:
            view = np.flip(view, axis=2)

    if patient_position != "HFS" and patient_orientation:
        if patient_orientation[0] == "L":
            view = np.fliplr(view)
        if len(patient_orientation) > 1 and patient_orientation[1] == "P":
            view = np.flipud(view)
    return view


def middle_frontal_slice(frontal_stack: np.ndarray) -> np.ndarray:
    """The reference takes the middle slice of the frontal stack
    (ai_tools.py:98-99)."""
    return frontal_stack[:, :, frontal_stack.shape[-1] // 2]
