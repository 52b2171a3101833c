"""Benchmark: all three north-star metrics in ONE JSON line.

1. word-crop recognitions/s/chip — full device inference pipeline for judged
   config #1 (ingest resize/normalize -> ResNet18+BiLSTM -> CTC greedy),
   target >=5,000 crops/s (BASELINE.json; the reference publishes no
   throughput numbers — BASELINE.md).
2. full-page detect+recognize pages/s — the real composed E2EPipeline device
   program (detector -> CCL -> region extract -> crops -> recognizer) with
   exact (stride-1) postprocessing, target >=100 pages/s.
3. p50 batch latency of that e2e program (tracked, no hard target).

``vs_baseline`` on the headline metric is crops/s against the 5k target; the
page metrics carry their own vs-target ratios in the same line.

Measurement notes: the axon TPU tunnel has ~25 ms host<->device round-trip
and an async dispatch whose ``block_until_ready`` does not reliably block,
so we (a) run K pipeline iterations inside ONE jitted ``lax.scan`` with a
data dependence between iterations, (b) force a real sync via a scalar
host transfer, and (c) time two K values and use the slope to cancel the
constant sync/dispatch overhead.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def _slope_time(timed_fn, k1, k2, reps=3):
    """Seconds per iteration via two-point slope; cancels sync overhead."""
    timed_fn(k1)  # compile k1
    timed_fn(k2)  # compile k2
    t1 = min(timed_fn(k1) for _ in range(reps))
    t2 = min(timed_fn(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def bench_crops():
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.ops.ctc import ctc_greedy_decode
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
    from megreader_tpu.ops.precision import cast_floats

    B = 512
    model = CTCRecognizer(num_classes=37)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, 100, 3), jnp.float32)
    )
    variables = cast_floats(variables, jnp.bfloat16)  # serving precision

    @functools.partial(jax.jit, static_argnames=("iters",))
    def pipeline_loop(variables, canvases, sizes, iters):
        def body(carry, _):
            canv = canvases + carry * 1e-6  # data dependence: no CSE/elision
            img, _w = resize_with_aspect_pad(canv, sizes, (32, 100))
            img = normalize(img).astype(jnp.bfloat16)
            logits = model.net.apply(variables, img, train=False)
            T = logits.shape[1]
            ids, lens = ctc_greedy_decode(logits, jnp.full((B,), T, jnp.int32))
            checksum = (jnp.sum(ids) + jnp.sum(lens)).astype(jnp.float32)
            return checksum * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    rng = np.random.default_rng(0)
    canvases = jnp.asarray(rng.random((B, 64, 256, 3)) * 255.0, jnp.float32)
    sizes = jnp.asarray(
        np.stack([rng.integers(24, 64, B), rng.integers(40, 256, B)], axis=1),
        jnp.int32,
    )

    def timed(iters):
        t0 = time.perf_counter()
        float(pipeline_loop(variables, canvases, sizes, iters))  # real sync
        return time.perf_counter() - t0

    per_batch = _slope_time(timed, 4, 24)
    return B / max(per_batch, 1e-9)


def bench_pages(stride: int = 1):
    """(pages/s, p50 batch latency ms) for the exact e2e device program."""
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.ops.precision import cast_floats
    from megreader_tpu.pipelines import E2EPipeline

    B, H, W, K = 8, 640, 640, 32
    det = SegDetector()
    rec = CTCRecognizer(num_classes=37)
    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, H, W, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    # Honest postproc load: trained weights (when a training workspace is
    # around) produce realistic text masks — an untrained detector on noise
    # yields near-empty masks and flatters CCL/extract by ~25%.
    trained = False
    try:
        from megreader_tpu.train import CheckpointManager

        mgr = CheckpointManager("/tmp/mr_runs/eval_e2e/det")
        if mgr.latest_step() is not None:
            det_vars = mgr.restore_variables(det_vars)
            trained = True
    except Exception:
        pass
    det_vars = cast_floats(det_vars, jnp.bfloat16)
    rec_vars = cast_floats(rec_vars, jnp.bfloat16)

    pipe = E2EPipeline(det, rec, max_regions=K, postproc_stride=stride, bf16=True)
    run = pipe._build(det_vars, rec_vars)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(det_vars, rec_vars, pages, iters):
        def body(carry, _):
            out = run(det_vars, rec_vars, pages + carry * 1e-6)
            checksum = (
                jnp.sum(out["ids"]) + jnp.sum(out["lengths"])
            ).astype(jnp.float32) + jnp.sum(out["quads"]) * 1e-9
            return checksum * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    # real rendered text pages, not noise — the postproc cost depends on
    # the mask content
    from megreader_tpu.data import SyntheticDetectionDataset

    ds = SyntheticDetectionDataset(n=B, hw=(H, W), seed=900, gt_maps=False)
    pages = jnp.asarray(
        np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32)
    )

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(det_vars, rec_vars, pages, iters))
        return time.perf_counter() - t0

    per_batch = _slope_time(timed, 2, 10)
    return B / max(per_batch, 1e-9), per_batch * 1e3, B, trained


def main():
    import jax

    # persistent compile cache: cold fp32 compiles on this backend can run
    # minutes; repeat bench invocations should pay them once
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    crops_per_sec = bench_crops()
    pages_per_sec, p50_ms, page_batch, trained = bench_pages(stride=1)

    crops_target, pages_target = 5000.0, 100.0
    print(
        json.dumps(
            {
                "metric": "word_crop_recognitions_per_sec_per_chip",
                "value": round(crops_per_sec, 1),
                "unit": "crops/s",
                "vs_baseline": round(crops_per_sec / crops_target, 3),
                "pages_per_sec_exact_postproc": round(pages_per_sec, 2),
                "pages_vs_target_100": round(pages_per_sec / pages_target, 3),
                "p50_batch_latency_ms": round(p50_ms, 2),
                "page_batch_size": page_batch,
                "pages_bench_on_text_pages": True,
                "pages_bench_trained_detector": trained,
            }
        )
    )


if __name__ == "__main__":
    main()
