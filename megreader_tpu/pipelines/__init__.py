from .bucketed import BucketedE2E
from .e2e import E2EPipeline
from .predictors import DetectorPredictor, RecognizerPredictor

__all__ = [
    "BucketedE2E",
    "E2EPipeline",
    "DetectorPredictor",
    "RecognizerPredictor",
]
