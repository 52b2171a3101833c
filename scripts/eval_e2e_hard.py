#!/usr/bin/env python
"""Hard-tier e2e: detector + each recognizer family over hard/curved pages.

VERDICT r3 #2 endgame: after the crop-level 1D-vs-2D-CTC A/B, run CURVED
pages through the full pipeline with both heads and report e2e recall —
plus the mixed hard set with the hard-trained CTC.

Expects checkpoints trained via cli.train from:
  experiments/seg_detector_hard.yaml   (detector, hard pages)
  experiments/ctc_hard.yaml            (1D-CTC, mixed hard crops, 32x100)
  experiments/ctc_curved_ab.yaml       (1D-CTC, curved-only crops, 48x160)
  experiments/ctc2d_curved_ab.yaml     (2D-CTC, curved-only crops, 48x160)

  python scripts/eval_e2e_hard.py [--pages 96]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import megreader_tpu.all  # noqa: F401


def _load(config):
    import jax

    from megreader_tpu.experiment import Experiment
    from megreader_tpu.train import CheckpointManager

    exp = Experiment.from_yaml(config)
    first = exp.prepare(next(iter(exp.eval_loader or exp.train_loader)))
    variables = exp.model.init(jax.random.PRNGKey(0), first["image"])
    variables = CheckpointManager(exp.workspace).restore_variables(variables)
    return exp, variables


def eval_set(det, det_vars, rec, rec_vars, cs, ds, crop_hw, n_pages, batch=8,
             rectify="perspective"):
    import jax.numpy as jnp

    from megreader_tpu.pipelines import E2EPipeline

    pipe = E2EPipeline(
        det, rec, charset=cs, max_regions=16, rectify=rectify,
        bf16=True, crop_hw=crop_hw,
    )
    hit = tot = det_hit = 0
    for s in range(0, n_pages, batch):
        samples = [ds[i] for i in range(s, min(s + batch, n_pages))]
        pages = jnp.asarray(
            np.stack([x["image"] for x in samples]).astype(np.float32)
        )
        results = pipe.predict(det_vars, rec_vars, pages)
        for sample, preds in zip(samples, results):
            gt_words = [cs.normalize(t) for t in sample["texts"]]
            pred_words = [p["text"] for p in preds]
            tot += len(gt_words)
            # detection attribution: GT polygon center covered by some quad
            for poly in sample["polygons"]:
                c = poly.mean(axis=0)
                for p in preds:
                    q = p["polygon"]
                    if (q[:, 0].min() - 4 <= c[0] <= q[:, 0].max() + 4
                            and q[:, 1].min() - 4 <= c[1] <= q[:, 1].max() + 4):
                        det_hit += 1
                        break
            for w in gt_words:
                if w in pred_words:
                    pred_words.remove(w)
                    hit += 1
    return {
        "e2e_recall": round(hit / max(tot, 1), 4),
        "det_cover": round(det_hit / max(tot, 1), 4),
        "total_words": tot,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=96)
    ap.add_argument("--modes", default=None,
                    help="comma list: restrict rectify modes (e.g. 'chain')")
    ap.add_argument("--arms", default=None,
                    help="comma substring list: restrict arms by name")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )

    from megreader_tpu.data.hard_synth import HardSyntheticDetectionDataset

    det_exp, det_vars = _load("experiments/seg_detector_hard.yaml")
    det, cs = det_exp.model, None

    sets = {
        "hard-mixed": HardSyntheticDetectionDataset(
            n=args.pages, seed=9100, gt_maps=False
        ),
        "curved-only": HardSyntheticDetectionDataset(
            n=args.pages, seed=9200, gt_maps=False, curve_prob=1.0,
            max_rotate=0.0, min_height=18, max_height=44, degrade=0.4,
        ),
    }
    # (config, crop_hw, sets, rectify modes). 'chain' is the curved-text
    # piecewise unwarp (ops/chains.py) — the page-level test of whether the
    # crop-level curved wins transfer (VERDICT r4 missing #2).
    arms = {
        "ctc_hard(32x100)": ("experiments/ctc_hard.yaml", (32, 100),
                             ["hard-mixed", "curved-only"],
                             ["perspective", "chain"]),
        "ctc_curved(48x160)": ("experiments/ctc_curved_ab.yaml", (48, 160),
                               ["curved-only"], ["perspective", "chain"]),
        "ctc2d_curved(48x160)": ("experiments/ctc2d_curved_ab.yaml", (48, 160),
                                 ["curved-only"], ["perspective", "chain"]),
        "ctc_hard_mix(32x100)": ("experiments/ctc_hard_mix.yaml", (32, 100),
                                 ["hard-mixed"], ["perspective", "chain"]),
    }
    if args.arms:
        subs = args.arms.split(",")
        arms = {a: v for a, v in arms.items() if any(s in a for s in subs)}
    if args.modes:
        keep = set(args.modes.split(","))
        arms = {
            a: (cfg, hw, sn, [m for m in md if m in keep])
            for a, (cfg, hw, sn, md) in arms.items()
        }
    report = {}
    for arm, (cfg, crop_hw, set_names, modes) in arms.items():
        if not modes:
            continue
        rec_exp, rec_vars = _load(cfg)
        cs = rec_exp.charset
        for sn in set_names:
            for mode in modes:
                r = eval_set(det, det_vars, rec_exp.model, rec_vars, cs,
                             sets[sn], crop_hw, args.pages, rectify=mode)
                key = f"{sn}/{arm}/{mode}"
                report[key] = r
                print(f"{key}: {r}", flush=True)
    print(json.dumps({"pages_per_set": args.pages, "results": report}))


if __name__ == "__main__":
    main()
