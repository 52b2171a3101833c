#!/usr/bin/env python
"""Stage breakdown of the e2e page pipeline (trained detector weights).

Times progressively larger prefixes of the composed device program with the
slope harness (see bench.py measurement notes), so each stage's marginal
cost is the difference:

  det:        normalize -> SegDetectorNet -> prob
  +ccl:       ... -> binarize -> connected_components
  +extract:   ... -> extract_regions -> quads
  +crops:     ... -> crop/rectify (box or perspective) -> normalized crops
  full:       ... -> recognizer -> greedy decode

Usage: profile_e2e.py [--stride 1] [--rectify box]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.ops.ccl import (
        connected_components,
        extract_regions,
        regions_to_quads,
        unclip_distance_for,
    )
    from megreader_tpu.ops.ctc import ctc_greedy_decode
    from megreader_tpu.ops.image import crop_resize_boxes, normalize
    from megreader_tpu.ops.precision import cast_floats

    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--rectify", default="box", choices=["box", "perspective"])
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/jax_cache")
    B = args.batch
    H = W = args.hw
    K, Ho, Wo = 32, 32, 100
    s = args.stride
    det = SegDetector()
    rec = CTCRecognizer(num_classes=37)
    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, H, W, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    det_vars, _ = _bench._ensure_trained_detector(det, det_vars)
    det_vars = cast_floats(det_vars, jnp.bfloat16)
    rec_vars = cast_floats(rec_vars, jnp.bfloat16)

    ds = SyntheticDetectionDataset(n=B, hw=(H, W), seed=900, gt_maps=False)
    pages = jnp.asarray(
        np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32)
    )

    def prob_of(pages):
        x = normalize(pages).astype(jnp.bfloat16)
        maps = det.net.apply(det_vars, x, train=False)
        return maps["prob"].astype(jnp.float32)

    def mask_of(prob):
        if s > 1:
            prob_s = jax.lax.reduce_window(
                prob, -jnp.inf, jax.lax.max, (1, s, s), (1, s, s), "VALID"
            )
            prob_e = -jax.lax.reduce_window(
                -prob, -jnp.inf, jax.lax.max, (1, s, s), (1, s, s), "VALID"
            )
            return prob_e > 0.3, prob_s
        return prob > 0.3, prob

    def quads_of(prob):
        mask, prob_s = mask_of(prob)
        labels = connected_components(mask, max_iters=24)
        stats = extract_regions(labels, prob_s, max_regions=K)
        d = unclip_distance_for(stats, ratio=1.5)
        if s > 1:
            d = d + 1.0
        return regions_to_quads(stats, d) * s, stats

    def crops_of(pages, quads, stats):
        m = 4.0
        if args.rectify == "perspective":
            from megreader_tpu.ops.image import rectify_quads_mxu

            c = quads.mean(axis=-2, keepdims=True)
            qm = quads + jnp.sign(quads - c) * (m * 0.5)
            crops = rectify_quads_mxu(pages, qm, (Ho, Wo), aspect="preserve_h")
            crops = crops.reshape(B * K, Ho, Wo, 3)
        else:
            x0 = jnp.clip(jnp.min(quads[..., 0], axis=-1) - m, 0, W - 1)
            x1 = jnp.clip(jnp.max(quads[..., 0], axis=-1) + m, 1, W)
            y0 = jnp.clip(jnp.min(quads[..., 1], axis=-1) - m, 0, H - 1)
            y1 = jnp.clip(jnp.max(quads[..., 1], axis=-1) + m, 1, H)
            boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
            crops = crop_resize_boxes(pages, boxes, (Ho, Wo), aspect="preserve_h")
            crops = crops.reshape(B * K, Ho, Wo, 3)
        return normalize(crops).astype(jnp.bfloat16)

    stages = {
        "det": lambda p: jnp.sum(prob_of(p)),
        "det+ccl": lambda p: jnp.sum(
            connected_components(mask_of(prob_of(p))[0], max_iters=24)
        ).astype(jnp.float32),
        "det+ccl+extract": lambda p: jnp.sum(quads_of(prob_of(p))[0]),
        "det+ccl+extract+crops": lambda p: jnp.sum(
            crops_of(p, *quads_of(prob_of(p))).astype(jnp.float32)
        ),
    }

    def full(p):
        quads, stats = quads_of(prob_of(p))
        crops = crops_of(p, quads, stats)
        logits = rec.net.apply(rec_vars, crops, train=False)
        ids, lens = ctc_greedy_decode(
            logits.astype(jnp.float32),
            jnp.full((B * K,), logits.shape[1], jnp.int32),
        )
        return (jnp.sum(ids) + jnp.sum(lens)).astype(jnp.float32) + jnp.sum(quads) * 1e-9

    stages["full"] = full

    def time_stage(fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(pages, iters):
            def body(carry, _):
                return fn(pages + carry * 1e-6) * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(pages, iters))
            return time.perf_counter() - t0

        return _bench._slope_time(timed, 2, 10)

    prev = 0.0
    print(f"# stride={s} rectify={args.rectify} hw={H} batch={B}")
    for name, fn in stages.items():
        t = time_stage(fn) * 1e3
        print(f"{name:24s} {t:7.2f} ms/batch  (marginal {t - prev:+6.2f})")
        prev = t


if __name__ == "__main__":
    main()
