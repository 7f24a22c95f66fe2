from .colorize import (
    class_canvases,
    labels_to_bgr,
    bgr_to_labels,
    overlay_with_transparency,
)
from .cleanup import cleanup_labels

__all__ = [
    "class_canvases",
    "labels_to_bgr",
    "bgr_to_labels",
    "overlay_with_transparency",
    "cleanup_labels",
]
