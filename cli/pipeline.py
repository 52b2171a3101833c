#!/usr/bin/env python
"""End-to-end page OCR CLI (judged config #5): detector + recognizer
checkpoints -> per-page polygons + transcriptions (JSON lines), optional
visualization.

    python cli/pipeline.py \
        --detector experiments/seg_detector_synth.yaml --det-workspace W1 \
        --recognizer experiments/ctc_resnet18_synth.yaml --rec-workspace W2 \
        --images page1.jpg page2.jpg [--out-dir vis/]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import megreader_tpu.all  # noqa: F401
from megreader_tpu.experiment import Experiment


def _load(config, workspace):
    import jax

    from megreader_tpu.train import CheckpointManager

    exp = Experiment.from_yaml(config, {"experiment.workspace": workspace} if workspace else {})
    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    # params-only restore: inference must not depend on the optimizer the
    # checkpoint was trained with (opt_state trees differ across configs)
    variables = CheckpointManager(workspace or exp.workspace).restore_variables(
        variables
    )
    return exp, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", required=True)
    ap.add_argument("--det-workspace", default=None)
    ap.add_argument("--recognizer", required=True)
    ap.add_argument("--rec-workspace", default=None)
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--page-size", type=int, default=640)
    ap.add_argument("--max-regions", type=int, default=32)
    ap.add_argument("--box-thresh", type=float, default=0.5)
    ap.add_argument("--deskew", action="store_true")
    ap.add_argument(
        "--rectify", default="perspective",
        choices=["box", "deskew", "perspective"],
        help="crop geometry: axis-aligned box, three-shear deskew, or exact "
             "perspective rectification of the rotated quad (MXU path)",
    )
    ap.add_argument(
        "--rec-mode", default="greedy", choices=["greedy", "beam"],
        help="recognition decode inside the page program (any family)",
    )
    ap.add_argument("--beam-width", type=int, default=8)
    ap.add_argument(
        "--unclip", default="inverse", choices=["inverse", "ratio"],
        help="box expansion: 'inverse' = exact closed-form inverse of the "
             "training shrink (needs --shrink-ratio to match the detector "
             "checkpoint's training shrink); 'ratio' = the reference's "
             "heuristic d = A'*ratio/P' (ADVICE r3 #1 escape hatch)",
    )
    ap.add_argument(
        "--unclip-ratio", type=float, default=1.5,
        help="expansion ratio for --unclip ratio",
    )
    ap.add_argument(
        "--shrink-ratio", type=float, default=None,
        help="the detector's TRAINING shrink ratio, used by --unclip "
             "inverse; defaults to the detector config's train_dataset "
             "shrink_ratio when it declares one, else 0.4",
    )
    ap.add_argument(
        "--extract-impl", default="auto",
        choices=["auto", "xla", "pallas", "pallas_full"],
        help="region-stats path (auto = Pallas moment/extent kernels on TPU)",
    )
    ap.add_argument(
        "--bucketed", action="store_true",
        help="variable-size serving: aspect-preserving scale into the "
             "standard canvas buckets (one compiled program per bucket) "
             "instead of a square --page-size resize",
    )
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from megreader_tpu.pipelines import E2EPipeline

    det_exp, det_vars = _load(args.detector, args.det_workspace)
    rec_exp, rec_vars = _load(args.recognizer, args.rec_workspace)

    # default the inverse-unclip geometry from the detector's own training
    # shrink (experiment.py threads the dataset's shrink_ratio the same way)
    shrink = args.shrink_ratio
    if shrink is None:
        shrink = float(
            getattr(det_exp.train_loader and det_exp.train_loader.dataset,
                    "shrink_ratio", 0.4) or 0.4
        )

    pipe = E2EPipeline(
        det_exp.model,
        rec_exp.model,
        rec_exp.charset,
        max_regions=args.max_regions,
        box_thresh=args.box_thresh,
        unclip=args.unclip,
        unclip_ratio=args.unclip_ratio,
        shrink_ratio=shrink,
        deskew=args.deskew,
        rectify=args.rectify,
        rec_mode=args.rec_mode,
        beam_width=args.beam_width,
        extract_impl=args.extract_impl,
    )

    S = args.page_size
    pages, scales, originals = [], [], []
    for path in args.images:
        img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        if args.bucketed:
            pages.append(img.astype(np.float32))
            scales.append((1.0, 1.0))  # BucketedE2E rescales internally
        else:
            pages.append(cv2.resize(img, (S, S)).astype(np.float32))
            scales.append((w / S, h / S))
        originals.append(img)

    if args.bucketed:
        from megreader_tpu.pipelines import BucketedE2E

        results = BucketedE2E(pipe).predict(det_vars, rec_vars, pages)
    else:
        results = pipe.predict(det_vars, rec_vars, jnp.asarray(np.stack(pages)))

    for path, page, (sx, sy), orig in zip(args.images, results, scales, originals):
        dets = [
            {
                "polygon": (d["polygon"] * np.array([sx, sy])).tolist(),
                "text": d["text"],
                "score": d["score"],
            }
            for d in page
        ]
        print(json.dumps({"image": path, "detections": dets}))
        if args.out_dir:
            from megreader_tpu.postproc.visualizer import DetectionVisualizer

            vis = DetectionVisualizer(args.out_dir)
            name = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            vis.visualize(
                name,
                orig,
                [np.array(d["polygon"]) for d in dets],
                [d["text"] for d in dets],
            )


if __name__ == "__main__":
    main()
