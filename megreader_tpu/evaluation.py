"""Evaluation loops: recognition accuracy/NED, detection P/R/H-mean.

Role of the reference's ``eval.py`` path (SURVEY.md §3.2): model forward ->
representer -> measurer, accumulated over the eval set. Decode and polygon
extraction stay on device; only strings/corners cross to host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .experiment import Experiment
from .postproc.detection import SegDetectorRepresenter
from .postproc.measurers import DetectionMeasurer, RecognitionMeasurer
from .pipelines.predictors import RecognizerPredictor


def evaluate_recognition(exp: Experiment, variables, mode: str = "greedy") -> Dict[str, float]:
    predictor = RecognizerPredictor(exp.model, exp.charset, crop_hw=exp.crop_hw, mode=mode)
    measurer = RecognitionMeasurer()
    preds, gts = [], []
    assert exp.eval_loader is not None, "experiment has no eval dataset"
    for batch in exp.eval_loader:
        out = predictor.predict(variables, batch["image"], batch["size"])
        preds.extend(out)
        gts.extend(exp.charset.normalize(t) for t in batch["text"])
    return measurer.measure(preds, gts)


def evaluate_detection(
    exp: Experiment,
    variables,
    representer: Optional[SegDetectorRepresenter] = None,
    protocol: str = "icdar2015",  # or 'deteval'
    int8: bool = False,
) -> Dict[str, float]:
    import jax

    from .postproc.measurers import DetEvalMeasurer

    representer = representer or SegDetectorRepresenter()
    measurer = DetEvalMeasurer() if protocol == "deteval" else DetectionMeasurer()
    apply_fn = exp.model.net.apply
    if int8:
        # quality gate for the int8 serving trunk (ops/quantize.py) —
        # pairs with bench.py's det_fwd_ms_int8 timing
        from .ops.quantize import int8_methods

        apply_fn = int8_methods(apply_fn)
    forward = jax.jit(
        lambda v, x: apply_fn(v, x, train=False, heads=("prob",))["prob"]
    )
    raws = []
    assert exp.eval_loader is not None, "experiment has no eval dataset"
    from .ops.image import normalize

    for batch in exp.eval_loader:
        # eval needs pixels only — skip the prepare fn's GT rasterization
        x = normalize(jnp.asarray(batch["image"]).astype(jnp.float32))
        prob = forward(variables, x)
        results = representer.represent(prob, scales=np.asarray(batch["scale"]))
        for b, res in enumerate(results):
            gt_scaled = [
                p * np.asarray(batch["scale"][b])[None, :] for p in batch["polygons"][b]
            ]
            raws.append(
                measurer.measure_one(
                    list(res["polygons"]), gt_scaled, batch["ignore"][b]
                )
            )
    return measurer.gather(raws)


def evaluate_spotting(exp: Experiment, variables) -> Dict[str, float]:
    """RoI spotter over GT boxes: per-word accuracy/NED (recognition
    metrics conditioned on true localization — isolates the pooled-feature
    recognition quality from detector recall)."""
    import jax

    measurer = RecognitionMeasurer()
    decode = jax.jit(lambda v, img, rois: exp.model.decode(v, img, rois))
    preds, gts = [], []
    assert exp.eval_loader is not None, "experiment has no eval dataset"
    for batch in exp.eval_loader:
        prepped = exp.prepare(batch)
        ids, lens = decode(variables, prepped["image"], prepped["rois"])
        valid = np.asarray(prepped["roi_valid"])
        ids, lens = np.asarray(ids), np.asarray(lens)
        for b, texts in enumerate(batch["texts"]):
            for k, t in enumerate(texts[: ids.shape[1]]):
                if not valid[b, k]:
                    continue
                preds.append(exp.charset.decode(ids[b, k][: lens[b, k]]))
                gts.append(exp.charset.normalize(t))
    return measurer.measure(preds, gts)


def evaluate(
    exp: Experiment,
    variables,
    mode: str = "greedy",
    protocol: str = "icdar2015",
    representer_mode: str = "quad",
    int8: bool = False,
) -> Dict[str, float]:
    if exp.task in ("CTCRecognizer", "Ctc2dRecognizer", "AttentionRecognizer"):
        return evaluate_recognition(exp, variables, mode=mode)
    if exp.task in ("RoITextSpotter", "SharedTrunkSpotter"):
        return evaluate_spotting(exp, variables)
    return evaluate_detection(
        exp,
        variables,
        representer=SegDetectorRepresenter(mode=representer_mode),
        protocol=protocol,
        int8=int8,
    )
