"""Import every registrable component (the CLI's registry bootstrap).

Also pins a persistent XLA compilation cache (repo-local ``runs/jax_cache``)
when the process hasn't configured one: a cold SegDetector train-step compile
costs ~9 minutes on the axon tunnel, ~0 s cached. Respects any cache dir the
host already set (tests use /tmp/jax_cache via conftest.py)."""

import os as _os

import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "runs",
            "jax_cache",
        ),
    )

from .core.charset import AttentionCharset, Charset  # noqa: F401
from .data.datasets import (  # noqa: F401
    DetectionICDARDataset,
    RecognitionListDataset,
    SyntheticDetectionDataset,
    SyntheticRecognitionDataset,
)
from .data.hard_synth import (  # noqa: F401
    HardSyntheticDetectionDataset,
    HardSyntheticRecognitionDataset,
)
from .data.loader import Loader  # noqa: F401
from .experiment import Experiment  # noqa: F401
from .models.attention import AttentionRecognizer  # noqa: F401
from .models.detector import SegDetector  # noqa: F401
from .models.recognizer import CTCRecognizer  # noqa: F401
from .models.recognizer2d import Ctc2dRecognizer  # noqa: F401
from .models.spotter import RoITextSpotter, SharedTrunkSpotter  # noqa: F401
from .pipelines.e2e import E2EPipeline  # noqa: F401
from .pipelines.spotter_e2e import SpotterE2EPipeline  # noqa: F401
from .pipelines.predictors import DetectorPredictor, RecognizerPredictor  # noqa: F401
from .postproc.detection import SegDetectorRepresenter  # noqa: F401
from .postproc.measurers import DetectionMeasurer, RecognitionMeasurer  # noqa: F401
from .postproc.visualizer import DetectionVisualizer  # noqa: F401
from .train.checkpoint import CheckpointManager  # noqa: F401
from .train.logger import Logger  # noqa: F401
from .train.train_step import OptimizerConfig  # noqa: F401
from .train.trainer import Trainer  # noqa: F401
from .utils.signal_monitor import SignalMonitor  # noqa: F401
