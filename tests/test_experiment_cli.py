"""Experiment wiring from YAML + short end-to-end training smoke tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

import megreader_tpu.all  # noqa: F401
from megreader_tpu.experiment import Experiment

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_experiment_from_yaml(tmp_path):
    exp = Experiment.from_yaml(
        os.path.join(REPO, "experiments/ctc_resnet18_synth.yaml"),
        {
            "experiment.batch_size": 8,
            "experiment.epochs": 1,
            "experiment.workspace": str(tmp_path),
            "experiment.train_dataset.n": 16,
            "experiment.eval_dataset.n": 8,
            "experiment.model.hidden": 32,
            "experiment.model.num_encoder_layers": 1,
        },
    )
    assert exp.task == "CTCRecognizer"
    assert exp.train_loader is not None and len(exp.train_loader) == 2
    b = next(iter(exp.train_loader))
    prepped = exp.prepare(b)
    assert prepped["image"].shape == (8, 32, 100, 3)


def test_short_training_then_eval(tmp_path):
    """Config #1 micro-train: loss drops and eval produces metrics."""
    exp = Experiment.from_yaml(
        os.path.join(REPO, "experiments/ctc_resnet18_synth.yaml"),
        {
            "experiment.batch_size": 8,
            "experiment.epochs": 2,
            "experiment.workspace": str(tmp_path),
            "experiment.train_dataset.n": 32,
            "experiment.eval_dataset.n": 8,
            "experiment.model.hidden": 32,
            "experiment.model.num_encoder_layers": 1,
            "experiment.optimizer.lr": 1.0e-3,
            "experiment.log_every": 2,
        },
    )
    trainer = exp.make_trainer()
    state = trainer.train(resume=False)
    assert int(state.step) == 8  # 2 epochs x 4 steps

    from megreader_tpu.evaluation import evaluate

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics = evaluate(exp, variables)
    assert set(metrics) >= {"accuracy", "ned", "n"}
    assert metrics["n"] == 8


def test_detection_experiment_wiring(tmp_path):
    exp = Experiment.from_yaml(
        os.path.join(REPO, "experiments/seg_detector_synth.yaml"),
        {
            "experiment.batch_size": 2,
            "experiment.workspace": str(tmp_path),
            "experiment.train_dataset.n": 4,
            "experiment.train_dataset.hw": [64, 64],
            "experiment.eval_dataset.n": 2,
            "experiment.eval_dataset.hw": [64, 64],
            "experiment.model.fpn_dim": 32,
            "experiment.model.head_dim": 8,
        },
    )
    assert exp.task == "SegDetector"
    b = next(iter(exp.train_loader))
    p = exp.prepare(b)
    assert p["image"].shape == (2, 64, 64, 3)
    assert p["gt"].shape == (2, 64, 64)


def test_detection_eval_modes(tmp_path):
    """evaluate() plumbs representer_mode='poly' (chain polygons) and the
    int8 serving gate through to evaluate_detection — the cli/eval.py
    --representer/--int8 flags ride this path."""
    exp = Experiment.from_yaml(
        os.path.join(REPO, "experiments/seg_detector_synth.yaml"),
        {
            "experiment.batch_size": 2,
            "experiment.workspace": str(tmp_path),
            "experiment.train_dataset.n": 2,
            "experiment.train_dataset.hw": [64, 64],
            "experiment.eval_dataset.n": 2,
            "experiment.eval_dataset.hw": [64, 64],
            "experiment.model.fpn_dim": 16,
            "experiment.model.head_dim": 4,
            "experiment.model.width": 16,
        },
    )
    import jax

    from megreader_tpu.evaluation import evaluate

    first = exp.prepare(next(iter(exp.eval_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    for kw in ({"representer_mode": "poly"}, {"int8": True}):
        metrics = evaluate(exp, variables, **kw)
        assert set(metrics) >= {"precision", "recall", "hmean"}, kw
        assert all(0.0 <= metrics[k] <= 1.0 for k in ("precision", "recall", "hmean"))


def test_resume_continues_training(tmp_path):
    """Train, stop, resume: step counter and params continue, not restart."""
    overrides = {
        "experiment.batch_size": 8,
        "experiment.epochs": 1,
        "experiment.workspace": str(tmp_path),
        "experiment.train_dataset.n": 16,
        "experiment.eval_dataset.n": 8,
        "experiment.model.hidden": 16,
        "experiment.model.num_encoder_layers": 1,
        "experiment.log_every": 1,
    }
    exp = Experiment.from_yaml(
        os.path.join(REPO, "experiments/ctc_resnet18_synth.yaml"), overrides
    )
    t1 = exp.make_trainer()
    t1.checkpoint.save_every_steps = 1
    s1 = t1.train(resume=False)
    assert int(s1.step) == 2

    exp2 = Experiment.from_yaml(
        os.path.join(REPO, "experiments/ctc_resnet18_synth.yaml"),
        {**overrides, "experiment.epochs": 2},
    )
    t2 = exp2.make_trainer()
    # restores step 2, continues toward the TOTAL budget (epochs=2 -> 4
    # steps): resume extends the workspace, it does not re-run epochs on top
    s2 = t2.train(resume=True)
    assert int(s2.step) == 4

    # re-invoking with the same budget is a no-op (cached-harness semantics)
    s3 = exp2.make_trainer().train(resume=True)
    assert int(s3.step) == 4


def test_from_yaml_self_registers_in_fresh_process():
    """Regression: scripts that call Experiment.from_yaml without going
    through a CLI entry (bench_bucketed's _load path) must not hit
    "unknown component" — from_yaml self-registers the catalog. Run in a
    fresh interpreter so this module's `import megreader_tpu.all` can't
    mask the bug."""
    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "from megreader_tpu.experiment import Experiment;"
        "e = Experiment.from_yaml("
        f"'{os.path.join(REPO, 'experiments/ctc_resnet18_synth.yaml')}',"
        "{'experiment.train_dataset.n': 8, 'experiment.eval_dataset.n': 8});"
        "print('OK', e.task)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK CTCRecognizer" in out.stdout
