from .detection import SegDetectorRepresenter, detect_quads_device
from .measurers import (
    DetectionMeasurer,
    RecognitionMeasurer,
    edit_distance,
    polygon_iou,
)

__all__ = [
    "SegDetectorRepresenter",
    "detect_quads_device",
    "DetectionMeasurer",
    "RecognitionMeasurer",
    "edit_distance",
    "polygon_iou",
]
