from .datasets import (
    DetectionICDARDataset,
    RecognitionListDataset,
    SyntheticDetectionDataset,
    SyntheticRecognitionDataset,
)
from .loader import Loader, detection_collate, detection_collate_polys, recognition_collate
from .processes import (
    make_border_maps,
    make_seg_maps,
    offset_polygon,
    parse_icdar_gt,
    shrink_distance,
)

__all__ = [
    "DetectionICDARDataset",
    "RecognitionListDataset",
    "SyntheticDetectionDataset",
    "SyntheticRecognitionDataset",
    "Loader",
    "detection_collate",
    "detection_collate_polys",
    "recognition_collate",
    "make_border_maps",
    "make_seg_maps",
    "offset_polygon",
    "parse_icdar_gt",
    "shrink_distance",
]
