#!/usr/bin/env python
"""Per-condition recognition eval on the hard synthetic tier.

VERDICT r3 #1: the easy tier saturated (everything 0.95-1.00 on one clean
Hershey font), so quality claims need a ruler with ticks. This script
evaluates a trained recognizer checkpoint over a battery of condition
slices (fonts / polarity / curvature / degradation / size), plus the
legacy easy tier for continuity, and prints a markdown table + one JSON
line for RESULTS.md.

  python scripts/eval_hard.py experiments/ctc_hard.yaml [--mode beam]
      [--n 512] [--step N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import megreader_tpu.all  # noqa: F401
from megreader_tpu.core import parse_cli_overrides

# Condition slices: name -> HardSyntheticRecognitionDataset kwargs.
# 'all' is the headline distribution (every knob at training defaults);
# the others isolate one axis at a time.
SLICES = {
    "all(hard)": {},
    "clean(multi-font only)": {"degrade": 0.0, "distractors": False, "curve_prob": 0.0},
    "fonts=ttf": {"fonts": "ttf"},
    "fonts=hershey": {"fonts": "hershey"},
    "polarity=dark-on-light": {"polarity": "dark"},
    "polarity=light-on-dark": {"polarity": "light"},
    "curved only (0.25-0.8)": {"curve_prob": 1.0},
    "straight only": {"curve_prob": 0.0},
    "no degradation": {"degrade": 0.0},
    "small text (12-18px)": {"min_height": 12, "max_height": 18},
    "large text (28-44px)": {"min_height": 28, "max_height": 44},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    ap.add_argument("--int8", action="store_true",
                    help="int8 serving path (ops/quantize.py) quality gate")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--batch", type=int, default=64)
    args, rest = ap.parse_known_args()

    import jax
    import numpy as np

    from megreader_tpu.data.datasets import SyntheticRecognitionDataset
    from megreader_tpu.data.hard_synth import HardSyntheticRecognitionDataset
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.pipelines.predictors import RecognizerPredictor
    from megreader_tpu.postproc.measurers import RecognitionMeasurer
    from megreader_tpu.train import CheckpointManager

    exp = Experiment.from_yaml(args.config, parse_cli_overrides(rest))
    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    mgr = CheckpointManager(exp.workspace)
    step = args.step if args.step is not None else mgr.latest_step()
    variables = mgr.restore_variables(variables, step=step)

    predictor = RecognizerPredictor(
        exp.model, exp.charset, crop_hw=exp.crop_hw, mode=args.mode,
        int8=args.int8,
    )
    measurer = RecognitionMeasurer()

    def run(ds):
        preds, gts = [], []
        for s in range(0, len(ds), args.batch):
            items = [ds[i] for i in range(s, min(s + args.batch, len(ds)))]
            images = np.stack([it["image"] for it in items])
            sizes = np.stack([it["size"] for it in items])
            preds.extend(predictor.predict(variables, images, sizes))
            gts.extend(exp.charset.normalize(it["text"]) for it in items)
        return measurer.measure(preds, gts)

    rows = {}
    print(f"# hard-tier eval: {args.config} step={step} mode={args.mode}"
          f"{' int8' if args.int8 else ''} n={args.n}/slice\n")
    print("| condition | accuracy | NED |")
    print("|---|---|---|")
    for name, kw in SLICES.items():
        ds = HardSyntheticRecognitionDataset(
            n=args.n, seed=args.seed, charset=exp.charset, **kw
        )
        m = run(ds)
        rows[name] = m
        print(f"| {name} | {m['accuracy']:.3f} | {m['ned']:.3f} |", flush=True)
    easy = run(SyntheticRecognitionDataset(n=args.n, seed=args.seed,
                                           charset=exp.charset))
    rows["legacy easy tier"] = easy
    print(f"| legacy easy tier | {easy['accuracy']:.3f} | {easy['ned']:.3f} |")
    print()
    print(json.dumps({
        "config": os.path.basename(args.config), "step": int(step or 0),
        "mode": args.mode, "int8": bool(args.int8), "n_per_slice": args.n,
        "slices": {k: {kk: round(float(vv), 4) for kk, vv in v.items()}
                   for k, v in rows.items()},
    }))


if __name__ == "__main__":
    main()
