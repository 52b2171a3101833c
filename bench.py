"""Benchmark: ALL FIVE judged configs in ONE JSON line (VERDICT r3 #3).

1. word-crop recognitions/s/chip — full device inference pipeline for judged
   config #1 (ingest resize/normalize -> ResNet18+BiLSTM -> CTC greedy),
   target >=5,000 crops/s (BASELINE.json; the reference publishes no
   throughput numbers — BASELINE.md). An ``mfu`` field reports
   XLA-counted model FLOPs / measured time / v5e bf16 peak so dtype
   regressions (e.g. an fp32 leak halving MXU throughput) are directly
   attributable from the JSON.
2. ``crops_per_sec_ctc2d`` — judged config #2: batched 2D-CTC decode
   (markov heights, Viterbi height path) through the same ingest.
3. ``crops_per_sec_attention_beam`` — judged config #3: attention decoder
   with beam search (width 8) through the same ingest.
4./5. full-page detect+recognize pages/s — the real composed E2EPipeline
   device program (detector -> CCL -> region extract -> crops -> recognizer)
   with exact (stride-1) postprocessing, target >=100 pages/s. Reported for
   BOTH crop geometries: 'box' (axis-aligned) and 'perspective' (exact
   homography rectification — the quality mode, and the default).

Latency is reported as TRUE percentiles (p50/p95 over >=100 individually
timed executions, per-execution host sync) for the perspective e2e program
at batch 8 AND batch 1, plus ``tunnel_rtt_ms`` — the p50 of an empty cached
round trip on this ~25 ms-RTT axon tunnel — so on-host latency can be read
as p50 - rtt. Detector forward time and MFU are reported separately
(``det_fwd_ms``/``det_mfu``) — the detector trunk is the e2e ceiling.

The page bench is self-sufficient: if no trained detector checkpoint exists
under ``runs/`` it trains one deterministically (~640 steps on synthetic
pages) first, so ``pages_bench_trained_detector`` is always true — an
untrained detector on text pages yields unrealistically sparse masks and
flatters CCL/extraction by ~25%.

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
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
#: repo-local so trained-weight benches survive across sessions (/tmp is
#: wiped between driver rounds; runs/ is gitignored)
BENCH_DET_WORKSPACE = os.path.join(REPO, "runs", "bench", "det")

#: TPU v5e (v5 lite) bf16 peak per chip. MFU is only meaningful when the
#: bench runs on that part; on other backends treat it as relative.
PEAK_BF16_FLOPS = 197e12


def _slope_time(timed_fn, k1, k2, reps=3):
    """Seconds per iteration via two-point slope; cancels sync overhead."""
    timed_fn(k1)  # compile k1
    timed_fn(k2)  # compile k2
    t1 = min(timed_fn(k1) for _ in range(reps))
    t2 = min(timed_fn(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def _xla_flops(fn, *args):
    """FLOPs XLA counts for one execution of ``jit(fn)(*args)`` (None if
    the backend exposes no cost model)."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


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
    crops_per_sec = B / max(per_batch, 1e-9)

    # MFU of the judged forward (model apply only, the bench's bf16 input):
    # XLA-counted FLOPs for one batch / measured wall per batch / chip peak.
    def fwd(variables, img):
        return model.net.apply(variables, img, train=False)

    flops = _xla_flops(fwd, variables, jnp.zeros((B, 32, 100, 3), jnp.bfloat16))
    mfu = (flops / per_batch / PEAK_BF16_FLOPS) if flops else None
    return crops_per_sec, mfu, flops


def _ingest_crops(B, seed=0):
    """Shared bench input: (canvases (B,64,256,3) f32, sizes (B,2) i32)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    canvases = jnp.asarray(rng.random((B, 64, 256, 3)) * 255.0, jnp.float32)
    sizes = jnp.asarray(
        np.stack([rng.integers(24, 64, B), rng.integers(40, 256, B)], axis=1),
        jnp.int32,
    )
    return canvases, sizes


def _crops_loop_throughput(model_decode, B, k1=4, k2=24, seed=0):
    """crops/s for a decode fn ``(canvases, sizes) -> (ids, lens)`` run in a
    jitted scan with a data dependence (the config #1 measurement recipe)."""
    import jax
    import jax.numpy as jnp

    canvases, sizes = _ingest_crops(B, seed)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(canvases, sizes, iters):
        def body(carry, _):
            ids, lens = model_decode(canvases + carry * 1e-6, sizes)
            checksum = (jnp.sum(ids) + jnp.sum(lens)).astype(jnp.float32)
            return checksum * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(canvases, sizes, iters))
        return time.perf_counter() - t0

    per_batch = _slope_time(timed, k1, k2)
    return B / max(per_batch, 1e-9)


def bench_crops_int8():
    """Config #1 under the int8 serving path (ops/quantize.py): same ingest
    and greedy CTC decode, every Conv/Dense on the s8xs8->s32 MXU pipe.
    The recognizer is 0.55 MFU at bf16 — the next 2x is precision
    (VERDICT r4 task #5); v5e int8 peak is 2x bf16."""
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.ops.ctc import ctc_greedy_decode
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
    from megreader_tpu.ops.precision import cast_floats
    from megreader_tpu.ops.quantize import int8_methods

    B = 512
    model = CTCRecognizer(num_classes=37)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, 100, 3), jnp.float32)
    )
    variables = cast_floats(variables, jnp.bfloat16)
    apply_q = int8_methods(model.net.apply)

    def decode(canvases, sizes):
        img, _w = resize_with_aspect_pad(canvases, sizes, (32, 100))
        img = normalize(img).astype(jnp.bfloat16)
        logits = apply_q(variables, img, train=False)
        T = logits.shape[1]
        return ctc_greedy_decode(logits, jnp.full((B,), T, jnp.int32))

    return _crops_loop_throughput(decode, B)


def bench_crops_ctc2d():
    """Judged config #2: batched 2D-CTC decode (markov heights, device
    Viterbi height path) through the same ingest as config #1."""
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models.recognizer2d import Ctc2dRecognizer
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
    from megreader_tpu.ops.precision import cast_floats

    B = 512
    model = Ctc2dRecognizer(num_classes=37, transition="markov")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, 100, 3), jnp.float32)
    )
    variables = cast_floats(variables, jnp.bfloat16)

    def decode(canvases, sizes):
        img, _w = resize_with_aspect_pad(canvases, sizes, (32, 100))
        img = normalize(img).astype(jnp.bfloat16)
        return model.decode(variables, img, mode="greedy")

    return _crops_loop_throughput(decode, B)


def bench_crops_attention_beam(beam_width=8):
    """Judged config #3: attention decoder, beam search (width 8)."""
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models.attention import AttentionRecognizer
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
    from megreader_tpu.ops.precision import cast_floats

    B = 256  # beam keeps B*W live decode states
    model = AttentionRecognizer(num_classes=39)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, 100, 3), jnp.float32)
    )
    variables = cast_floats(variables, jnp.bfloat16)

    def decode(canvases, sizes):
        img, _w = resize_with_aspect_pad(canvases, sizes, (32, 100))
        img = normalize(img).astype(jnp.bfloat16)
        return model.decode_beam(variables, img, beam_width=beam_width)

    return _crops_loop_throughput(decode, B, k1=2, k2=10)


def bench_det_forward(det, det_vars, pages_norm, int8: bool = False):
    """Detector prob forward (serving heads) ms/batch + MFU (VERDICT r3 #5).
    ``int8=True`` times the same program under the int8 interception
    (VERDICT r4 task #4: the trunk is the MFU ceiling)."""
    import jax
    import jax.numpy as jnp

    apply_fn = det.net.apply
    if int8:
        from megreader_tpu.ops.quantize import int8_methods

        apply_fn = int8_methods(det.net.apply)

    def fwd(det_vars, x):
        return apply_fn(det_vars, x, train=False, heads=("prob",))["prob"]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(det_vars, x, iters):
        def body(carry, _):
            # cast the carry into x's dtype BEFORE the add: x is bf16 here,
            # and bf16 + f32-scalar promotes the whole input to f32 — which
            # silently times an fp32 detector (measured 24.3 vs 9.0 ms)
            prob = fwd(det_vars, x + (carry * 1e-6).astype(x.dtype))
            return jnp.sum(prob) * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(det_vars, pages_norm, iters))
        return time.perf_counter() - t0

    per_batch = _slope_time(timed, 2, 10)
    flops = _xla_flops(fwd, det_vars, pages_norm)
    mfu = (flops / per_batch / PEAK_BF16_FLOPS) if flops else None
    return per_batch * 1e3, mfu


def _latency_percentiles(fn, n=120, warmup=8):
    """True per-execution latency percentiles: each call is individually
    timed and host-synced (float() on a scalar). Includes the tunnel RTT —
    report alongside ``_null_rtt_ms`` so on-host latency is readable."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.sort(np.asarray(ts))
    return float(np.percentile(ts, 50)), float(np.percentile(ts, 95))


def _null_rtt_ms(n=60):
    """p50 of an empty cached device round trip (dispatch + tunnel)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 1.0000001)
    x = jnp.float32(1.0)
    float(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(np.asarray(ts), 50))


def _ensure_trained_detector(det, det_vars):
    """Restore trained detector weights, training deterministically first if
    no checkpoint exists anywhere under runs/ (self-sufficient: the driver
    always benches realistic text masks, never an untrained detector)."""
    from megreader_tpu.train import CheckpointManager

    candidates = [
        BENCH_DET_WORKSPACE,
        os.path.join(REPO, "runs", "eval_e2e", "det"),  # quality harness cache
    ]
    for ws in candidates:
        if not os.path.isdir(os.path.join(ws, "checkpoints")):
            continue
        mgr = CheckpointManager(ws)
        if mgr.latest_step() is not None:
            return mgr.restore_variables(det_vars), int(mgr.latest_step())

    # committed fp16 asset (scripts/export_bench_det.py): a fresh checkout
    # benches trained weights without retraining/cold-compiling first
    asset = os.path.join(REPO, "assets", "bench_det_fp16.msgpack")
    if os.path.isfile(asset):
        import jax
        from flax import serialization

        with open(asset, "rb") as f:
            payload = serialization.msgpack_restore(f.read())

        def widen(x):
            x = np.asarray(x)
            return x.astype(np.float32) if x.dtype == np.float16 else x

        restored = serialization.from_state_dict(
            det_vars, jax.tree.map(widen, payload["variables"])
        )
        return restored, int(payload["step"])

    # no cache: train ~640 steps on the synthetic page mix (fixed seeds)
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.train import OptimizerConfig

    t0 = time.time()
    exp = Experiment(
        model=det,
        train_dataset=SyntheticDetectionDataset(n=512, seed=10),
        batch_size=8,
        epochs=10,  # 512/8 * 10 = 640 steps
        workspace=BENCH_DET_WORKSPACE,
        optimizer=OptimizerConfig(name="adam", lr=3e-4, schedule="constant"),
        use_mesh=False,
        log_every=100,
        seed=0,
    )
    state = exp.make_trainer().train(resume=True)
    print(
        f"# bench: trained detector to step {int(state.step)} "
        f"in {time.time() - t0:.0f}s",
        flush=True,
    )
    bs = state.batch_stats if state.batch_stats else det_vars.get("batch_stats")
    out = {"params": state.params}
    if bs is not None:
        out["batch_stats"] = bs
    return out, int(state.step)


def bench_pages():
    """Box + perspective pages/s and box p50 latency for the exact e2e
    device program, trained detector weights."""
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.ops.image import normalize
    from megreader_tpu.ops.precision import cast_floats
    from megreader_tpu.pipelines import E2EPipeline

    B, H, W, K = 8, 640, 640, 32
    det = SegDetector()
    rec = CTCRecognizer(num_classes=37)
    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, H, W, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    det_vars, det_step = _ensure_trained_detector(det, det_vars)
    det_vars = cast_floats(det_vars, jnp.bfloat16)
    rec_vars = cast_floats(rec_vars, jnp.bfloat16)

    # real rendered text pages, not noise — the postproc cost depends on
    # the mask content
    from megreader_tpu.data import SyntheticDetectionDataset

    ds = SyntheticDetectionDataset(n=B, hw=(H, W), seed=900, gt_maps=False)
    pages = jnp.asarray(
        np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32)
    )

    resolved = {}

    def measure(rectify):
        pipe = E2EPipeline(
            det, rec, max_regions=K, rectify=rectify, bf16=True,
        )
        run = pipe.build()
        resolved.update(pipe.resolved_impls)  # what 'auto' actually picked

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

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(det_vars, rec_vars, pages, iters))
            return time.perf_counter() - t0

        per_batch = _slope_time(timed, 2, 10)
        return B / max(per_batch, 1e-9), run

    box_pps, _ = measure("box")
    persp_pps, persp_run = measure("perspective")
    # curved-text mode: band-chain piecewise unwarp (ops/chains.py) — the
    # polygon-output path; its cost vs perspective is the price of curved
    # pages surviving the pipeline
    chain_pps, _ = measure("chain")

    # TRUE latency percentiles on the DEFAULT (perspective) program:
    # batch 8 and a separately compiled batch-1 single-page program
    def exec8():
        out = persp_run(det_vars, rec_vars, pages)
        float(out["lengths"].sum())

    p50_b8, p95_b8 = _latency_percentiles(exec8)
    page1 = pages[:1]

    def exec1():
        out = persp_run(det_vars, rec_vars, page1)
        float(out["lengths"].sum())

    p50_b1, p95_b1 = _latency_percentiles(exec1)

    # DEVICE-timed batch-1 latency (VERDICT r4 task #6): the host-timed
    # percentiles above are tunnel-dominated (~33 ms RTT vs ~1.5 ms of
    # compute); an on-device scan slope at n=1 gives the driver a real
    # single-page p50 consistent with det_fwd + postproc + rec.
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop1(det_vars, rec_vars, page, iters):
        def body(carry, _):
            out = persp_run(det_vars, rec_vars, page + carry * 1e-6)
            checksum = (
                jnp.sum(out["ids"]) + jnp.sum(out["lengths"])
            ).astype(jnp.float32) + jnp.sum(out["quads"]) * 1e-9
            return checksum * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    def timed1(iters):
        t0 = time.perf_counter()
        float(loop1(det_vars, rec_vars, page1, iters))
        return time.perf_counter() - t0

    b1_device_ms = _slope_time(timed1, 4, 24) * 1e3

    pages_bf16 = normalize(pages).astype(jnp.bfloat16)
    det_ms, det_mfu = bench_det_forward(det, det_vars, pages_bf16)
    det_ms_int8, _ = bench_det_forward(det, det_vars, pages_bf16, int8=True)
    return {
        "pages_per_sec_exact_postproc": box_pps,
        "pages_per_sec_perspective": persp_pps,
        "pages_per_sec_chain": chain_pps,
        "e2e_p50_ms_batch8": p50_b8,
        "e2e_p95_ms_batch8": p95_b8,
        "e2e_p50_ms_batch1": p50_b1,
        "e2e_p95_ms_batch1": p95_b1,
        "e2e_batch1_device_ms": b1_device_ms,
        "tunnel_rtt_ms": _null_rtt_ms(),
        "det_fwd_ms": det_ms,
        "det_fwd_ms_int8": det_ms_int8,
        "det_mfu": det_mfu,
        "page_batch_size": B,
        "detector_trained_steps": det_step,
        "extract_impl": resolved.get("extract", "auto"),
        "ccl_impl": resolved.get("ccl", "auto"),
    }


def main():
    import jax

    # persistent compile cache: cold fp32 compiles on this backend can run
    # minutes; repeat bench invocations should pay them once
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, "runs", "jax_cache")
    )
    crops_per_sec, mfu, flops = bench_crops()
    crops_int8 = bench_crops_int8()
    crops_ctc2d = bench_crops_ctc2d()
    crops_attn_beam = bench_crops_attention_beam()
    pages = bench_pages()

    crops_target, pages_target = 5000.0, 100.0
    out = {
        "metric": "word_crop_recognitions_per_sec_per_chip",
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / crops_target, 3),
        "mfu": round(mfu, 4) if mfu else None,
        "model_gflops_per_batch": round(flops / 1e9, 2) if flops else None,
        # int8 serving path (VERDICT r4 task #5); quality gate in
        # scripts/eval_hard.py --int8
        "crops_per_sec_int8": round(crops_int8, 1),
        # judged configs #2 and #3 (VERDICT r3 #3)
        "crops_per_sec_ctc2d": round(crops_ctc2d, 1),
        "crops_per_sec_attention_beam": round(crops_attn_beam, 1),
        "pages_per_sec_exact_postproc": round(
            pages["pages_per_sec_exact_postproc"], 2
        ),
        "pages_per_sec_perspective": round(
            pages["pages_per_sec_perspective"], 2
        ),
        # curved-text (polygon/chain) mode — quality path for curved pages
        "pages_per_sec_chain": round(pages["pages_per_sec_chain"], 2),
        # headline tracks the DEFAULT pipeline mode (perspective)
        "pages_vs_target_100": round(
            pages["pages_per_sec_perspective"] / pages_target, 3
        ),
        "e2e_p50_ms_batch8": round(pages["e2e_p50_ms_batch8"], 2),
        "e2e_p95_ms_batch8": round(pages["e2e_p95_ms_batch8"], 2),
        "e2e_p50_ms_batch1": round(pages["e2e_p50_ms_batch1"], 2),
        "e2e_p95_ms_batch1": round(pages["e2e_p95_ms_batch1"], 2),
        # on-device single-page latency (scan slope, tunnel cancelled)
        "e2e_batch1_device_ms": round(pages["e2e_batch1_device_ms"], 2),
        "tunnel_rtt_ms": round(pages["tunnel_rtt_ms"], 2),
        "det_fwd_ms": round(pages["det_fwd_ms"], 2),
        "det_fwd_ms_int8": round(pages["det_fwd_ms_int8"], 2),
        "det_mfu": round(pages["det_mfu"], 4) if pages["det_mfu"] else None,
        "page_batch_size": pages["page_batch_size"],
        "pages_bench_on_text_pages": True,
        "pages_bench_trained_detector": True,
        "detector_trained_steps": pages["detector_trained_steps"],
        "extract_impl": pages["extract_impl"],
        "ccl_impl": pages["ccl_impl"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
