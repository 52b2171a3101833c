#!/usr/bin/env python
"""Train an experiment: ``python cli/train.py experiments/<exp>.yaml
[--resume] [--experiment.batch_size 128] [--experiment.optimizer.lr 1e-3] ...``

Same UX as the reference's ``train.py`` (SURVEY.md §3.1): one YAML, dotted
CLI overrides, checkpoint resume from the workspace.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import megreader_tpu.all  # noqa: F401  (registry bootstrap)
from megreader_tpu.core import parse_cli_overrides
from megreader_tpu.experiment import Experiment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--no-resume", action="store_true")
    args, rest = ap.parse_known_args()
    overrides = parse_cli_overrides(rest)
    exp = Experiment.from_yaml(args.config, overrides)
    trainer = exp.make_trainer()
    trainer.train(resume=not args.no_resume)


if __name__ == "__main__":
    main()
