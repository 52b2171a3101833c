#!/usr/bin/env python
"""Large-page e2e: throughput + exact-word recall at 1152 px pages.

VERDICT r2 missing #5 / SURVEY §7 hard part #5: the 1152² number was
round-1 stale (stride-2 postproc, untrained weights) and quality was never
measured there. This drives the SAME exact stride-1 pipeline as the 640²
harness on 1152² pages (the largest DEFAULT_BUCKETS canvas) with trained
weights: box + perspective recall over --pages pages, slope-timed pages/s.

Usage: python scripts/eval_large_pages.py [--pages 64]
Reuses the trained detector/recognizer cached by scripts/eval_e2e.py
(trains them first if absent).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from eval_e2e import eval_condition, train_models


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.ops.precision import cast_floats
    from megreader_tpu.pipelines import E2EPipeline

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=64)
    ap.add_argument("--hw", type=int, default=1152)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-regions", type=int, default=48)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )
    det, det_vars, rec, rec_vars, cs = train_models()

    H = W = args.hw
    B, K = args.batch, args.max_regions
    # Quality: rotated/perspective large pages, both crop geometries.
    ds = SyntheticDetectionDataset(
        n=args.pages, hw=(H, W), seed=910, gt_maps=False,
        max_rotate=25, max_persp=0.08,
    )
    report = {}
    for rectify in ("box", "perspective"):
        pipe = E2EPipeline(
            det, rec, charset=cs, max_regions=K, rectify=rectify, bf16=True
        )
        hit = tot = 0
        for s in range(0, args.pages, B):
            samples = [ds[i] for i in range(s, min(s + B, args.pages))]
            pages = jnp.asarray(
                np.stack([x["image"] for x in samples]).astype(np.float32)
            )
            results = pipe.predict(det_vars, rec_vars, pages)
            for sample, preds in zip(samples, results):
                gt = [cs.normalize(t) for t in sample["texts"]]
                pred = [p["text"] for p in preds]
                tot += len(gt)
                for w in gt:
                    if w in pred:
                        pred.remove(w)
                        hit += 1
        report[f"recall_{rectify}"] = round(hit / max(tot, 1), 4)
        report[f"words_{rectify}"] = tot

    # Throughput: slope-timed jitted program, box + perspective.
    pages = jnp.asarray(
        np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32)
    )
    dv = cast_floats(det_vars, jnp.bfloat16)
    rv = cast_floats(rec_vars, jnp.bfloat16)
    for rectify in ("box", "perspective"):
        pipe = E2EPipeline(det, rec, max_regions=K, rectify=rectify, bf16=True)
        run = pipe.build()

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(dv, rv, pages, iters, run=run):
            def body(carry, _):
                out = run(dv, rv, pages + carry * 1e-6)
                cs_ = (jnp.sum(out["ids"]) + jnp.sum(out["lengths"])).astype(
                    jnp.float32
                ) + jnp.sum(out["quads"]) * 1e-9
                return cs_ * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(dv, rv, pages, iters))
            return time.perf_counter() - t0

        per_batch = _bench._slope_time(timed, 2, 8)
        report[f"pages_per_sec_{rectify}"] = round(B / per_batch, 2)

    report.update(hw=H, batch=B, max_regions=K, pages=args.pages)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
