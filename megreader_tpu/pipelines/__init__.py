from .e2e import E2EPipeline
from .predictors import DetectorPredictor, RecognizerPredictor

__all__ = ["E2EPipeline", "DetectorPredictor", "RecognizerPredictor"]
