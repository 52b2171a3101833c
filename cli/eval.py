#!/usr/bin/env python
"""Evaluate a checkpoint: ``python cli/eval.py experiments/<exp>.yaml
[--step N] [--mode beam]`` — reference eval.py analog (SURVEY.md §3.2).
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import megreader_tpu.all  # noqa: F401
from megreader_tpu.core import parse_cli_overrides
from megreader_tpu.evaluation import evaluate
from megreader_tpu.experiment import Experiment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    ap.add_argument("--protocol", default="icdar2015", choices=["icdar2015", "deteval"])
    ap.add_argument("--representer", default="quad", choices=["quad", "poly"],
                    help="detection output mode: min-area quads or chain "
                         "polygons (curved text; reference contour mode)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 serving path (ops/quantize.py) quality gate "
                         "for the detection trunk")
    args, rest = ap.parse_known_args()

    import jax

    exp = Experiment.from_yaml(args.config, parse_cli_overrides(rest))

    # Restore the latest (or given) checkpoint from the workspace —
    # params-only, so eval works on checkpoints from any optimizer config.
    from megreader_tpu.train import CheckpointManager

    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    init_args = (first["image"], first["rois"]) if "rois" in first else (first["image"],)
    variables = exp.model.init(jax.random.PRNGKey(0), *init_args)
    mgr = CheckpointManager(exp.workspace)
    step = args.step if args.step is not None else mgr.latest_step()
    variables = mgr.restore_variables(variables, step=step)

    metrics = evaluate(exp, variables, mode=args.mode, protocol=args.protocol,
                       representer_mode=args.representer, int8=args.int8)
    print(json.dumps({"step": int(step or 0), **metrics}))


if __name__ == "__main__":
    main()
