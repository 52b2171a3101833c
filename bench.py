"""Benchmark: word-crop recognitions/sec/chip on the headline config #1 path.

Measures the full device inference pipeline (ingest resize/normalize ->
ResNet18+BiLSTM -> CTC greedy decode) on whatever accelerator jax exposes
(the real TPU chip under the driver). Prints ONE JSON line; ``vs_baseline``
is the ratio against the BASELINE.json north-star target of 5,000
crops/s/chip (the reference publishes no throughput numbers — BASELINE.md).

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


def main():
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
        v = float(pipeline_loop(variables, canvases, sizes, iters))  # real sync
        return time.perf_counter() - t0, v

    K1, K2 = 4, 24
    timed(K1)  # compile K1
    timed(K2)  # compile K2
    t1 = min(timed(K1)[0] for _ in range(3))
    t2 = min(timed(K2)[0] for _ in range(3))
    per_batch = (t2 - t1) / (K2 - K1)
    crops_per_sec = B / max(per_batch, 1e-9)

    target = 5000.0
    print(
        json.dumps(
            {
                "metric": "word_crop_recognitions_per_sec_per_chip",
                "value": round(crops_per_sec, 1),
                "unit": "crops/s",
                "vs_baseline": round(crops_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
