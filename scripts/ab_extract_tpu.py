#!/usr/bin/env python
"""In-pipeline extract A/B on TPU: centered-XLA vs hybrid vs pallas_full.

Decides extract_regions(impl='auto'). Run when the chip is reachable:
    python scripts/ab_extract_tpu.py
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/jax_cache")
    import bench as _bench
    from megreader_tpu.data import SyntheticDetectionDataset
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
    det_vars, _ = _bench._ensure_trained_detector(det, det_vars)
    det_vars = cast_floats(det_vars, jnp.bfloat16)
    rec_vars = cast_floats(rec_vars, jnp.bfloat16)
    ds = SyntheticDetectionDataset(n=B, hw=(H, W), seed=900, gt_maps=False)
    pages = jnp.asarray(
        np.stack([ds[i]["image"] for i in range(B)]).astype(np.float32)
    )

    def measure(rectify, impl):
        pipe = E2EPipeline(
            det, rec, max_regions=K, bf16=True, rectify=rectify,
            extract_impl=impl,
        )
        run = pipe.build()

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(dv, rv, pages, iters):
            def body(c, _):
                out = run(dv, rv, pages + c * 1e-6)
                cs = (
                    jnp.sum(out["ids"]) + jnp.sum(out["lengths"])
                ).astype(jnp.float32) + jnp.sum(out["quads"]) * 1e-9
                return cs * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        def timed(iters):
            t0 = time.perf_counter()
            float(loop(det_vars, rec_vars, pages, iters))
            return time.perf_counter() - t0

        per = _bench._slope_time(timed, 2, 10)
        print(
            f"{rectify:12s} extract={impl:12s}: {B/per:7.1f} pages/s "
            f"({per*1e3:.2f} ms/batch)",
            flush=True,
        )
        return B / per

    for rectify in ("perspective", "box"):
        for impl in ("xla", "pallas", "pallas_full"):
            measure(rectify, impl)


if __name__ == "__main__":
    main()
