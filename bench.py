"""Benchmark: word-crop recognitions/sec/chip on the headline config #1 path.

Measures the full device inference pipeline (ingest resize/normalize ->
ResNet18+BiLSTM -> CTC greedy decode) on whatever accelerator jax exposes
(real TPU chip under the driver). Prints ONE JSON line; ``vs_baseline`` is
the ratio against the BASELINE.json north-star target of 5,000 crops/s/chip
(the reference publishes no throughput numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.ops.ctc import ctc_greedy_decode
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad

    B = 512
    ITERS = 20
    model = CTCRecognizer(num_classes=37)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, 100, 3), jnp.float32)
    )

    @jax.jit
    def pipeline(variables, canvases, sizes):
        img, _w = resize_with_aspect_pad(canvases, sizes, (32, 100))
        img = normalize(img)
        logits = model.net.apply(variables, img, train=False)
        T = logits.shape[1]
        return ctc_greedy_decode(logits, jnp.full((B,), T, jnp.int32))

    rng = np.random.default_rng(0)
    canvases = jnp.asarray(rng.random((B, 64, 256, 3)) * 255.0, jnp.float32)
    sizes = jnp.asarray(
        np.stack(
            [rng.integers(24, 64, B), rng.integers(40, 256, B)], axis=1
        ),
        jnp.int32,
    )

    # warmup / compile
    ids, lens = pipeline(variables, canvases, sizes)
    ids.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        ids, lens = pipeline(variables, canvases, sizes)
    ids.block_until_ready()
    dt = time.perf_counter() - t0

    crops_per_sec = B * ITERS / dt
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
