from .model import YoloV11, yolov11_spec
from .post import (
    decode_detections,
    nms_fixed,
    process_masks,
    postprocess_detect,
    postprocess_segment,
)
from .convert import convert_ultralytics_checkpoint, load_weights

__all__ = [
    "YoloV11",
    "yolov11_spec",
    "decode_detections",
    "nms_fixed",
    "process_masks",
    "postprocess_detect",
    "postprocess_segment",
    "convert_ultralytics_checkpoint",
    "load_weights",
]
