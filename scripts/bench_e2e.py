#!/usr/bin/env python
"""Full-page detect+recognize throughput + p50 latency (BASELINE targets:
>=100 pages/s, p50 tracked). Same slope-timing discipline as bench.py
(axon tunnel: ~25 ms sync overhead, async dispatch).
"""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    B, H, W, K = 8, 640, 640, 32
    det = SegDetector()
    rec = CTCRecognizer(num_classes=37)
    rng = jax.random.PRNGKey(0)
    det_vars = cast_floats(det.init(rng, jnp.zeros((1, H, W, 3))), jnp.bfloat16)
    rec_vars = cast_floats(rec.init(rng, jnp.zeros((1, 32, 100, 3))), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(det_vars, rec_vars, pages, iters):
        def body(carry, _):
            pg = pages + carry * 1e-6
            x = normalize(pg).astype(jnp.bfloat16)
            maps = det.net.apply(det_vars, x, train=False)
            prob = maps["prob"].astype(jnp.float32)
            m = prob > 0.3
            labels = connected_components(m)
            stats = extract_regions(labels, prob, max_regions=K)
            d = unclip_distance_for(stats)
            quads = regions_to_quads(stats, d)
            x0 = jnp.clip(jnp.min(quads[..., 0], -1), 0, W - 1)
            x1 = jnp.clip(jnp.max(quads[..., 0], -1), 1, W)
            y0 = jnp.clip(jnp.min(quads[..., 1], -1), 0, H - 1)
            y1 = jnp.clip(jnp.max(quads[..., 1], -1), 1, H)
            boxes = jnp.stack([x0, y0, x1, y1], -1)
            crops = crop_resize_boxes(pg, boxes, (32, 100))
            crops = normalize(crops.reshape(B * K, 32, 100, 3)).astype(jnp.bfloat16)
            logits = rec.net.apply(rec_vars, crops, train=False)
            ids, lens = ctc_greedy_decode(
                logits.astype(jnp.float32),
                jnp.full((B * K,), logits.shape[1], jnp.int32),
            )
            return (jnp.sum(ids) + jnp.sum(lens)).astype(jnp.float32) * 1e-9, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    rng_np = np.random.default_rng(0)
    pages = jnp.asarray(rng_np.random((B, H, W, 3)) * 255.0, jnp.float32)

    def timed(iters):
        t0 = time.perf_counter()
        float(loop(det_vars, rec_vars, pages, iters))
        return time.perf_counter() - t0

    K1, K2 = 2, 10
    timed(K1)
    timed(K2)
    t1 = min(timed(K1) for _ in range(3))
    t2 = min(timed(K2) for _ in range(3))
    per_batch = (t2 - t1) / (K2 - K1)
    pages_per_sec = B / per_batch
    print(
        json.dumps(
            {
                "metric": "full_page_detect_recognize_images_per_sec",
                "value": round(pages_per_sec, 2),
                "unit": "pages/s",
                "p50_batch_latency_ms": round(per_batch * 1e3, 2),
                "vs_target_100": round(pages_per_sec / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
