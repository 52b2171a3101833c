from .bucketed import BucketedE2E
from .e2e import E2EPipeline
from .predictors import DetectorPredictor, RecognizerPredictor
from .spotter_e2e import SpotterE2EPipeline

__all__ = [
    "BucketedE2E",
    "E2EPipeline",
    "SpotterE2EPipeline",
    "DetectorPredictor",
    "RecognizerPredictor",
]
