#!/usr/bin/env python
"""A/B the quad unclip mode: heuristic ratio vs exact shrink inverse.

The remaining perspective-pipeline quality loss is detected-quad
imprecision (rec|det 0.932 vs 1.000 at GT quads — RESULTS.md round 3).
One identified cause: the reference's unclip heuristic d = A'*1.5/P' of
the SHRUNK region under-expands elongated words (0.75 h' where the true
inverse of the r=0.4 training shrink is 2.625 h').

This script loads the cached eval_e2e models and runs the attributed
harness (det recall / rec-given-det / e2e recall) over unclip variants:

  ratio1.5   the reference heuristic (pipeline default so far)
  ratio2.0   a fatter heuristic (common DB deployment tweak)
  inverse    ops/ccl.unclip_distance_inverse closed form

on upright + rotated/perspective page sets, perspective rectification.

Usage: python scripts/ab_unclip.py [--pages 64] [--cpu]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="serve f32 (CPU bf16 emulation is very slow)")
    ap.add_argument("--sets", default="upright,rotated")
    ap.add_argument("--conditions", default="ratio1.5,ratio2.0,inverse")
    args = ap.parse_args()

    from convergence import eval_attributed
    from eval_e2e import train_models

    from megreader_tpu.data import SyntheticDetectionDataset

    det, det_vars, rec, rec_vars, cs = train_models()

    all_sets = {
        "upright": SyntheticDetectionDataset(n=args.pages, seed=900, gt_maps=False),
        "rotated": SyntheticDetectionDataset(
            n=args.pages, seed=901, gt_maps=False, max_rotate=25, max_persp=0.08
        ),
    }
    eval_sets = {k: all_sets[k] for k in args.sets.split(",")}
    variants = {}
    for c in args.conditions.split(","):
        if c.startswith("ratio"):
            variants[c] = {"unclip": "ratio", "unclip_ratio": float(c[5:])}
        elif c == "inverse":
            variants[c] = {"unclip": "inverse"}
        else:
            raise SystemExit(f"unknown condition {c}")

    report = {}
    for set_name, ds in eval_sets.items():
        for name, kw in variants.items():
            if args.f32:
                kw = dict(kw, bf16=False)
            row = eval_attributed(
                det, det_vars, rec, rec_vars, cs, ds, "perspective",
                args.pages, batch=args.batch, **kw,
            )
            key = f"{set_name}/{name}"
            report[key] = row
            print(key, row, flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
