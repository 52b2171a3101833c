#!/usr/bin/env python
"""E2E quality harness: exact word recall over hundreds of synthetic pages.

Addresses VERDICT r1 weak #3: round 1's 84.4% e2e recall rested on 8
axis-aligned pages (45 words). This harness:

1. trains a detector on synthetic pages (upright + rotated mix) and a
   recognizer on synthetic crops (device-augmented),
2. evaluates the COMPOSED pipeline on >=100 fresh pages per condition:
   upright and rotated/perspective page sets x rectification modes
   (box / deskew / perspective),
3. reports exact-text word recall (a GT word counts as recalled when some
   prediction on its page equals it, multiset semantics).

Usage: python scripts/eval_e2e.py [--pages 128] [--retrain]
Checkpoints cached under <repo>/runs/eval_e2e (repo-local, gitignored —
/tmp is wiped between sessions, and bench.py probes this cache for
trained-detector weights).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--cpu" in sys.argv:
    # before any device touch: the sitecustomize axon backend ignores env
    # vars (see .claude/skills/verify) — config API only
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np

WORKDIR = os.path.join(__file__.rsplit("/", 2)[0], "runs", "eval_e2e")


class _Concat:
    def __init__(self, parts):
        self.parts = parts
        self.lens = [len(p) for p in parts]

    def __len__(self):
        return sum(self.lens)

    def __getitem__(self, i):
        for p, n in zip(self.parts, self.lens):
            if i < n:
                return p[i]
            i -= n
        raise IndexError

    # the device-GT experiment pokes this on datasets it owns
    @property
    def gt_maps(self):
        return self.parts[0].gt_maps

    @gt_maps.setter
    def gt_maps(self, v):
        for p in self.parts:
            p.gt_maps = v


def train_models(det_steps=640, rec_epochs=25):
    import jax

    from megreader_tpu.core import Charset
    from megreader_tpu.data import (
        SyntheticDetectionDataset,
        SyntheticRecognitionDataset,
    )
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.train import OptimizerConfig

    cs = Charset()
    os.makedirs(WORKDIR, exist_ok=True)

    # --- detector: upright + rotated mix ---
    det_ds = _Concat([
        SyntheticDetectionDataset(n=512, seed=10),
        SyntheticDetectionDataset(n=512, seed=11, max_rotate=25, max_persp=0.08),
    ])
    det_exp = Experiment(
        model=SegDetector(),
        train_dataset=det_ds,
        batch_size=8,
        epochs=max(1, det_steps // 128),
        workspace=os.path.join(WORKDIR, "det"),
        optimizer=OptimizerConfig(name="adam", lr=3e-4, schedule="constant"),
        use_mesh=False,
        log_every=50,
    )
    t0 = time.time()
    det_state = det_exp.make_trainer().train(resume=True)
    print(f"detector trained to step {int(det_state.step)} in {time.time()-t0:.0f}s")

    # --- recognizer: synthetic crops, device-augmented ---
    rec_exp = Experiment(
        model=CTCRecognizer(num_classes=cs.num_classes),
        train_dataset=SyntheticRecognitionDataset(n=4096, seed=20),
        eval_dataset=SyntheticRecognitionDataset(n=256, seed=21),
        batch_size=64,
        epochs=rec_epochs,
        workspace=os.path.join(WORKDIR, "rec"),
        optimizer=OptimizerConfig(
            name="adam", lr=1e-3, schedule="warmup_cosine",
            warmup_steps=100, total_steps=rec_epochs * 64,
        ),
        augment=True,
        use_mesh=False,
        log_every=50,
    )
    t0 = time.time()
    rec_state = rec_exp.make_trainer().train(resume=True)
    print(f"recognizer trained to step {int(rec_state.step)} in {time.time()-t0:.0f}s")

    from megreader_tpu.evaluation import evaluate_recognition

    rec_vars = {"params": rec_state.params, "batch_stats": rec_state.batch_stats}
    acc = evaluate_recognition(rec_exp, rec_vars)
    print("recognizer crop eval:", acc)

    det_vars = {"params": det_state.params, "batch_stats": det_state.batch_stats}
    return det_exp.model, det_vars, rec_exp.model, rec_vars, cs


def eval_condition(det, det_vars, rec, rec_vars, cs, pages_ds, rectify,
                   n_pages, batch=8, extract_impl="auto"):
    import jax.numpy as jnp

    from megreader_tpu.pipelines import E2EPipeline

    pipe = E2EPipeline(
        det, rec, charset=cs, max_regions=16, rectify=rectify, bf16=True,
        extract_impl=extract_impl,
    )
    hit = tot = 0
    t_infer = 0.0
    for s in range(0, n_pages, batch):
        samples = [pages_ds[i] for i in range(s, min(s + batch, n_pages))]
        pages = jnp.asarray(
            np.stack([x["image"] for x in samples]).astype(np.float32)
        )
        t0 = time.time()
        results = pipe.predict(det_vars, rec_vars, pages)
        t_infer += time.time() - t0
        for sample, preds in zip(samples, results):
            gt_words = [cs.normalize(t) for t in sample["texts"]]
            pred_words = [p["text"] for p in preds]
            tot += len(gt_words)
            for w in gt_words:
                if w in pred_words:
                    pred_words.remove(w)
                    hit += 1
    return hit, tot, t_infer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=128)
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--det-steps", type=int, default=640)
    ap.add_argument("--rec-epochs", type=int, default=25)
    ap.add_argument("--extract-impl", default="auto",
                    help="region-stats path: auto|xla|pallas|pallas_full")
    ap.add_argument("--conditions", default="box,deskew,perspective")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-import)")
    args = ap.parse_args()

    if args.retrain:
        import shutil

        shutil.rmtree(WORKDIR, ignore_errors=True)

    from megreader_tpu.data import SyntheticDetectionDataset

    det, det_vars, rec, rec_vars, cs = train_models(
        det_steps=args.det_steps, rec_epochs=args.rec_epochs
    )

    eval_sets = {
        "upright": SyntheticDetectionDataset(n=args.pages, seed=900, gt_maps=False),
        "rotated": SyntheticDetectionDataset(
            n=args.pages, seed=901, gt_maps=False, max_rotate=25, max_persp=0.08
        ),
    }
    conditions = args.conditions.split(",")
    report = {}
    for set_name, ds in eval_sets.items():
        for rectify in conditions:
            hit, tot, t = eval_condition(
                det, det_vars, rec, rec_vars, cs, ds, rectify, args.pages,
                extract_impl=args.extract_impl,
            )
            key = f"{set_name}/{rectify}"
            report[key] = {
                "recall": round(hit / max(tot, 1), 4),
                "hits": hit,
                "total": tot,
            }
            print(key, report[key], f"({t:.1f}s)")
    out = {"pages_per_set": args.pages, "results": report}
    with open(os.path.join(WORKDIR, "report.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
