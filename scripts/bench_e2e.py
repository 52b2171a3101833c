#!/usr/bin/env python
"""Full-page detect+recognize throughput + p50 latency (BASELINE targets:
>=100 pages/s, p50 tracked). Times the real E2EPipeline device program via
slope timing (see bench.py notes on the axon tunnel).

Times exact stride-1 postproc (the pooled stride-2 mode was removed in round 3).
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
    from megreader_tpu.ops.precision import cast_floats
    from megreader_tpu.pipelines import E2EPipeline

    B, H, W, K = 8, 640, 640, 32
    det = SegDetector()
    rec = CTCRecognizer(num_classes=37)
    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, H, W, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    # trained weights -> realistic masks (honest postproc load); trains a
    # detector into runs/bench/det if no cache exists (shared with bench.py)
    import bench as _bench

    det_vars, _step = _bench._ensure_trained_detector(det, det_vars)
    det_vars = cast_floats(det_vars, jnp.bfloat16)
    rec_vars = cast_floats(rec_vars, jnp.bfloat16)

    pipe = E2EPipeline(
        det, rec, max_regions=K, bf16=True
    )
    run = pipe.build(det_vars, rec_vars)

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

    from megreader_tpu.data import SyntheticDetectionDataset

    ds = SyntheticDetectionDataset(n=B, hw=(H, W), seed=900, gt_maps=False)
    pages = jnp.asarray(
        np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32)
    )

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
