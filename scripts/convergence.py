#!/usr/bin/env python
"""Quality-ceiling probe: recall vs training budget, det-miss vs rec-error.

VERDICT r2 weak #5 / next #7: box-mode upright recall sat at 82.2% with a
640-step detector and nobody knew whether that was a pipeline limit or a
training limit. This script trains the detector in stages (640 -> 1280 ->
2560 -> 5120 steps; resume=True extends the same workspace) and, at each
stage, evaluates the composed pipeline on the SAME 128-page sets as
scripts/eval_e2e.py — but attributing every miss:

  det recall   GT word's polygon is IoU>=0.5-matched by some predicted quad
  rec|det      among det-matched words, the predicted text equals the GT
  e2e recall   exact-text multiset recall (the harness headline number)

so a plateau reads as either "detector stops finding words" (det recall
flat) or "recognizer misreads found words" (rec|det flat). The recognizer
is trained once to its own convergence (--rec-epochs, cosine to zero) and
held fixed across detector stages.

Usage: python scripts/convergence.py [--stages 640,1280,2560,5120]
Caches under runs/eval_e2e (shared with eval_e2e.py / bench.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from eval_e2e import WORKDIR, _Concat


def _quad_iou(quad, poly):
    """IoU via rasterization on a small local grid (exact enough for
    matching at 0.5; avoids a geometry dependency)."""
    import cv2

    pts = np.concatenate([quad, poly], 0)
    x0, y0 = np.floor(pts.min(0)).astype(int) - 1
    x1, y1 = np.ceil(pts.max(0)).astype(int) + 1
    w, h = max(x1 - x0, 1), max(y1 - y0, 1)
    if w * h > 4_000_000:
        return 0.0
    a = np.zeros((h, w), np.uint8)
    b = np.zeros((h, w), np.uint8)
    cv2.fillPoly(a, [np.round(quad - [x0, y0]).astype(np.int32)], 1)
    cv2.fillPoly(b, [np.round(poly - [x0, y0]).astype(np.int32)], 1)
    inter = float(np.sum(a & b))
    union = float(np.sum(a | b))
    return inter / union if union else 0.0


def eval_attributed(det, det_vars, rec, rec_vars, cs, pages_ds, rectify,
                    n_pages, batch=8, iou_thresh=0.5, **pipe_kwargs):
    """Returns dict with det/e2e recall and rec-given-det accuracy."""
    import jax.numpy as jnp

    from megreader_tpu.pipelines import E2EPipeline

    kw = dict(charset=cs, max_regions=16, rectify=rectify, bf16=True)
    kw.update(pipe_kwargs)
    pipe = E2EPipeline(det, rec, **kw)
    det_hit = rec_hit = e2e_hit = tot = 0
    for s in range(0, n_pages, batch):
        samples = [pages_ds[i] for i in range(s, min(s + batch, n_pages))]
        pages = jnp.asarray(
            np.stack([x["image"] for x in samples]).astype(np.float32)
        )
        results = pipe.predict(det_vars, rec_vars, pages)
        for sample, preds in zip(samples, results):
            gts = [
                (np.asarray(p, np.float32), cs.normalize(t))
                for p, t, ign in zip(
                    sample["polygons"], sample["texts"], sample["ignore"]
                )
                if not ign
            ]
            quads = [np.asarray(p["polygon"], np.float32) for p in preds]
            texts = [p["text"] for p in preds]
            tot += len(gts)
            used = [False] * len(quads)
            # e2e multiset recall (same semantics as eval_e2e)
            pool = list(texts)
            for _, t in gts:
                if t in pool:
                    pool.remove(t)
                    e2e_hit += 1
            # detection attribution: best unused IoU match per GT
            for poly, t in gts:
                best, best_j = 0.0, -1
                for j, q in enumerate(quads):
                    if used[j]:
                        continue
                    iou = _quad_iou(q, poly)
                    if iou > best:
                        best, best_j = iou, j
                if best >= iou_thresh:
                    used[best_j] = True
                    det_hit += 1
                    if texts[best_j] == t:
                        rec_hit += 1
    return {
        "det_recall": round(det_hit / max(tot, 1), 4),
        "rec_given_det": round(rec_hit / max(det_hit, 1), 4),
        "e2e_recall": round(e2e_hit / max(tot, 1), 4),
        "total": tot,
    }


def main():
    import time

    import jax

    from megreader_tpu.core import Charset
    from megreader_tpu.data import (
        SyntheticDetectionDataset,
        SyntheticRecognitionDataset,
    )
    from megreader_tpu.evaluation import evaluate_recognition
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.train import OptimizerConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="640,1280,2560,5120")
    ap.add_argument("--pages", type=int, default=128)
    ap.add_argument("--rec-epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    stages = [int(s) for s in args.stages.split(",")]

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )
    cs = Charset()
    os.makedirs(WORKDIR, exist_ok=True)

    # --- recognizer: train ONCE to convergence, reuse across det stages ---
    rec_exp = Experiment(
        model=CTCRecognizer(num_classes=cs.num_classes),
        train_dataset=SyntheticRecognitionDataset(n=4096, seed=20),
        eval_dataset=SyntheticRecognitionDataset(n=256, seed=21),
        batch_size=64,
        epochs=args.rec_epochs,
        workspace=os.path.join(WORKDIR, "rec_conv"),
        optimizer=OptimizerConfig(
            name="adam", lr=1e-3, schedule="warmup_cosine",
            warmup_steps=100, total_steps=args.rec_epochs * 64,
        ),
        augment=True,
        use_mesh=False,
        log_every=200,
    )
    t0 = time.time()
    rec_state = rec_exp.make_trainer().train(resume=True)
    rec_vars = {"params": rec_state.params, "batch_stats": rec_state.batch_stats}
    crop_acc = evaluate_recognition(rec_exp, rec_vars)
    print(
        f"recognizer: step {int(rec_state.step)} ({time.time()-t0:.0f}s), "
        f"crop eval {crop_acc}"
    )

    det_ds = _Concat([
        SyntheticDetectionDataset(n=512, seed=10),
        SyntheticDetectionDataset(n=512, seed=11, max_rotate=25, max_persp=0.08),
    ])
    eval_sets = {
        "upright": SyntheticDetectionDataset(
            n=args.pages, seed=900, gt_maps=False
        ),
        "rotated": SyntheticDetectionDataset(
            n=args.pages, seed=901, gt_maps=False, max_rotate=25, max_persp=0.08
        ),
    }

    curve = []
    for target in stages:
        det_exp = Experiment(
            model=SegDetector(),
            train_dataset=det_ds,
            batch_size=args.batch,
            epochs=max(1, target // 128),
            workspace=os.path.join(WORKDIR, "det"),
            optimizer=OptimizerConfig(name="adam", lr=3e-4, schedule="constant"),
            use_mesh=False,
            log_every=100,
        )
        t0 = time.time()
        det_state = det_exp.make_trainer().train(resume=True)
        step = int(det_state.step)
        det_vars = {
            "params": det_state.params, "batch_stats": det_state.batch_stats
        }
        row = {"det_steps": step, "train_s": round(time.time() - t0, 1)}
        for set_name, ds in eval_sets.items():
            rectify = "box" if set_name == "upright" else "perspective"
            r = eval_attributed(
                det_exp.model, det_vars, rec_exp.model, rec_vars, cs, ds,
                rectify, args.pages,
            )
            row[f"{set_name}/{rectify}"] = r
            print(f"step {step} {set_name}/{rectify}: {r}")
        curve.append(row)

    out = {
        "rec_steps": int(rec_state.step),
        "rec_crop_eval": crop_acc,
        "curve": curve,
    }
    with open(os.path.join(WORKDIR, "convergence.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
