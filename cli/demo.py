#!/usr/bin/env python
"""Run a trained model on one image and write an annotated visualization:
``python cli/demo.py experiments/<exp>.yaml --image page.jpg [--out out.png]``
— reference demo.py analog (SURVEY.md §3.3).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import megreader_tpu.all  # noqa: F401
from megreader_tpu.core import parse_cli_overrides
from megreader_tpu.experiment import Experiment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default="demo_out.png")
    ap.add_argument("--step", type=int, default=None)
    args, rest = ap.parse_known_args()

    import cv2
    import jax
    import jax.numpy as jnp

    exp = Experiment.from_yaml(args.config, parse_cli_overrides(rest))

    from megreader_tpu.train import CheckpointManager

    # params-only restore: inference works on checkpoints from any
    # optimizer config (full TrainState restore refuses opt_state drift)
    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    variables = CheckpointManager(exp.workspace).restore_variables(
        variables, step=args.step
    )

    img = cv2.cvtColor(cv2.imread(args.image, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)

    if exp.task in ("CTCRecognizer", "Ctc2dRecognizer", "AttentionRecognizer"):
        from megreader_tpu.pipelines import RecognizerPredictor

        h, w = img.shape[:2]
        canvas_h, canvas_w = max(64, h), max(256, w)
        canvas = np.zeros((1, canvas_h, canvas_w, 3), np.float32)
        canvas[0, :h, :w] = img
        pred = RecognizerPredictor(exp.model, exp.charset, crop_hw=exp.crop_hw)
        text = pred.predict(variables, canvas, np.array([[h, w]], np.int32))[0]
        print(f"transcription: {text!r}")
    else:
        from megreader_tpu.pipelines import DetectorPredictor
        from megreader_tpu.postproc.visualizer import DetectionVisualizer

        H = W = 640
        h, w = img.shape[:2]
        resized = cv2.resize(img, (W, H))
        pred = DetectorPredictor(exp.model)
        res = pred.predict(
            variables,
            resized[None].astype(np.float32),
            scales=np.array([[w / W, h / H]], np.float32),
        )[0]
        vis = DetectionVisualizer(".")
        path = vis.visualize(args.out.rsplit(".", 1)[0], img, res["polygons"])
        print(f"{len(res['polygons'])} regions -> {path}")


if __name__ == "__main__":
    main()
