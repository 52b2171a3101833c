#!/usr/bin/env python
"""Mixed-size page serving: BucketedE2E vs resize-everything (VERDICT r3 #7).

Builds a mixed set of 512/640/896/1152-px pages (rotated synthetic text),
then measures:

  A. BucketedE2E — each page scales (never upscales) into the smallest
     canvas bucket, one compiled program per bucket; aggregate pages/s,
     per-bucket exact-text word recall, and the compile count.
  B. Naive — every page resized to one 1152x1152 canvas (the only
     fixed-shape program that preserves the largest pages), same metrics.

Checkpoints: the cached eval_e2e workspace (trains if absent — same
recipe as bench.py/eval_e2e). Run on TPU: python scripts/bench_bucketed.py
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-per-size", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-regions", type=int, default=48)
    ap.add_argument("--hard", action="store_true",
                    help="mixed-size HARD pages with hard-trained arms "
                         "(VERDICT r4 #1: the easy-page recall table is "
                         "saturated; re-base the bucketed quality axis)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )

    from eval_e2e import train_models  # cached checkpoints

    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.data.bucketing import DEFAULT_BUCKETS, pick_bucket
    from megreader_tpu.pipelines import BucketedE2E, E2EPipeline

    if args.hard:
        from bench_spotter import _load_ckpt

        det_exp, det_vars = _load_ckpt("experiments/seg_detector_hard.yaml")
        rec_exp, rec_vars = _load_ckpt("experiments/ctc_hard_mix.yaml")
        det, rec, cs = det_exp.model, rec_exp.model, rec_exp.charset
    else:
        det, det_vars, rec, rec_vars, cs = train_models()

    sizes = [(512, 512), (640, 640), (896, 896), (1152, 1152)]
    pages, gts, page_size = [], [], []
    for si, hw in enumerate(sizes):
        if args.hard:
            from megreader_tpu.data.hard_synth import (
                HardSyntheticDetectionDataset,
            )

            # curve_prob=0 to match the spotter A/B: the bucketing question
            # is size handling, and curves would depress both arms equally
            ds = HardSyntheticDetectionDataset(
                n=args.pages_per_size, hw=hw, seed=7000 + si, gt_maps=False,
                curve_prob=0.0, max_rotate=15.0,
            )
        else:
            ds = SyntheticDetectionDataset(
                n=args.pages_per_size, hw=hw, seed=7000 + si, gt_maps=False,
                max_rotate=15, max_persp=0.05,
            )
        for i in range(args.pages_per_size):
            it = ds[i]
            pages.append(it["image"].astype(np.float32))
            gts.append([cs.normalize(t) for t in it["texts"]])
            page_size.append(hw[0])

    def recall_of(results):
        per_size = {}
        for res, gt, sz in zip(results, gts, page_size):
            preds = [p["text"] for p in res]
            hit = 0
            for w in gt:
                if w in preds:
                    preds.remove(w)
                    hit += 1
            h, t = per_size.get(sz, (0, 0))
            per_size[sz] = (h + hit, t + len(gt))
        total_h = sum(h for h, _ in per_size.values())
        total_t = sum(t for _, t in per_size.values())
        return {
            "overall": round(total_h / max(total_t, 1), 4),
            **{f"{sz}px": round(h / max(t, 1), 4) for sz, (h, t) in sorted(per_size.items())},
        }

    pipe = E2EPipeline(
        det, rec, charset=cs, max_regions=args.max_regions,
        rectify="perspective", bf16=True,
    )
    bucketed = BucketedE2E(pipe, batch=args.batch)

    # warm both paths (compile), then time
    _ = bucketed.predict(det_vars, rec_vars, pages[: args.batch])
    n_programs = len({pick_bucket(p.shape[0], p.shape[1], DEFAULT_BUCKETS)
                      for p in pages})
    t0 = time.perf_counter()
    res_b = bucketed.predict(det_vars, rec_vars, pages)
    t_bucket = time.perf_counter() - t0

    # naive: everything into the ONE canvas that preserves the largest page
    S = 1152
    import cv2

    _ = pipe.predict(det_vars, rec_vars, jnp.asarray(np.stack(
        [cv2.resize(p, (S, S)).astype(np.float32) for p in pages[: args.batch]]
    )))
    t0 = time.perf_counter()
    res_n = []
    # the per-page resize is part of the naive serving cost — time it too
    for s in range(0, len(pages), args.batch):
        chunk = [cv2.resize(p, (S, S)).astype(np.float32)
                 for p in pages[s : s + args.batch]]
        kept = len(chunk)
        while len(chunk) < args.batch:
            chunk = chunk + [np.zeros((S, S, 3), np.float32)]
        out = pipe.predict(det_vars, rec_vars, jnp.asarray(np.stack(chunk)))
        res_n.extend(out[:kept])
    t_naive = time.perf_counter() - t0

    # --- device-side serving throughput (slope-timed inside one jitted
    # scan, so the axon tunnel's per-call transfer/RTT — which dominates
    # the host loops above on this dev setup — is excluded) ---
    from megreader_tpu.ops.precision import cast_floats

    run = pipe.build()
    bf_d = cast_floats(det_vars, jnp.bfloat16)
    bf_r = cast_floats(rec_vars, jnp.bfloat16)

    def batch_ms(pages_batch):
        batch = jnp.asarray(pages_batch)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(p, iters):
            def body(c, _):
                out = run(bf_d, bf_r, p + c * 1e-6)
                c2 = (jnp.sum(out["ids"]) + jnp.sum(out["lengths"])).astype(
                    jnp.float32
                )
                return c2 * 1e-9, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(batch, iters))
            return time.perf_counter() - t0

        i1, i2 = 2, 10
        timed(i1); timed(i2)
        # paired slopes (ADVICE r4: independent min-of-3 per arm lets a
        # lucky short run pair with an unlucky long run and bias the slope)
        slopes = [(timed(i2) - timed(i1)) / (i2 - i1) for _ in range(3)]
        return min(slopes) * 1e3

    # one representative real batch per bucket actually used
    by_bucket = {}
    for p in pages:
        b = pick_bucket(p.shape[0], p.shape[1], DEFAULT_BUCKETS)
        by_bucket.setdefault(b, []).append(p)
    import math

    dev_total_s, per_bucket_ms = 0.0, {}
    for b, group in sorted(by_bucket.items()):
        H, W = b
        batch_np = np.zeros((args.batch, H, W, 3), np.float32)
        # stride through the group so the representative batch spans the
        # bucket's size mix (ADVICE r4: first-4 picks only the smallest
        # size, and pl.when-guarded CCL sweeps make runtime content-
        # dependent)
        stride = max(1, len(group) // args.batch)
        sel = group[::stride][: args.batch]
        for j in range(min(args.batch, len(sel))):
            from megreader_tpu.data.bucketing import fit_to_bucket

            batch_np[j] = fit_to_bucket(sel[j], b)["image"]
        ms = batch_ms(batch_np)
        per_bucket_ms[f"{H}x{W}"] = round(ms, 2)
        dev_total_s += math.ceil(len(group) / args.batch) * ms / 1e3
    nstride = max(1, len(pages) // args.batch)
    naive_ms = batch_ms(np.stack(
        [cv2.resize(p, (S, S)).astype(np.float32)
         for p in pages[::nstride][: args.batch]]
    ))
    n = len(pages)
    dev_naive_s = math.ceil(n / args.batch) * naive_ms / 1e3

    report = {
        "tier": "hard" if args.hard else "easy",
        "n_pages": n,
        "bucketed": {
            "device_pages_per_sec": round(n / dev_total_s, 1),
            "device_batch_ms": per_bucket_ms,
            "host_loop_pages_per_sec_tunnel_bound": round(n / t_bucket, 2),
            "compiled_programs": n_programs,
            "recall": recall_of(res_b),
        },
        "naive_1152": {
            "device_pages_per_sec": round(n / dev_naive_s, 1),
            "device_batch_ms": {f"{S}x{S}": round(naive_ms, 2)},
            "host_loop_pages_per_sec_tunnel_bound": round(n / t_naive, 2),
            "compiled_programs": 1,
            "recall": recall_of(res_n),
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
