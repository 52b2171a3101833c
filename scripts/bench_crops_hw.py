#!/usr/bin/env python
"""Crop-recognizer throughput at an arbitrary input size.

The hard tier's worst slices (small text, curves) improve with a taller
input (ctc_hard48.yaml) — this prints the crops/s cost of that choice so
the quality/throughput tradeoff is explicit.

  python scripts/bench_crops_hw.py --hw 48 160
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[48, 160])
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )
    from bench import _crops_loop_throughput

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.ops.image import normalize, resize_with_aspect_pad
    from megreader_tpu.ops.precision import cast_floats

    Ho, Wo = args.hw
    B = args.batch
    model = CTCRecognizer(num_classes=37)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, Ho, Wo, 3), jnp.float32)
    )
    variables = cast_floats(variables, jnp.bfloat16)

    def decode(canvases, sizes):
        img, _w = resize_with_aspect_pad(canvases, sizes, (Ho, Wo))
        img = normalize(img).astype(jnp.bfloat16)
        from megreader_tpu.ops.ctc import ctc_greedy_decode

        logits = model.net.apply(variables, img, train=False)
        T = logits.shape[1]
        return ctc_greedy_decode(logits, jnp.full((B,), T, jnp.int32))

    cps = _crops_loop_throughput(decode, B)
    print({"crop_hw": [Ho, Wo], "crops_per_sec": round(cps, 1)})


if __name__ == "__main__":
    main()
