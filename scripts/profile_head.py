#!/usr/bin/env python
"""MapHead sub-op breakdown at serving shapes (640², batch 8, bf16).

profile_det.py showed the prob head is ~7.2 of the detector's 13.4 ms at
~6.6% MFU on its ~92 GFLOP — far below the trunk's 27%. This times the
head's stages by prefix slope (conv1 -> BN/relu -> up1 -> BN/relu -> up2
-> sigmoid) plus a fused-vs-naive upsample A/B to find where the time goes.
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from megreader_tpu.models.detector import (
        MapHead,
        _fused_upsample_conv,
        _resize_to,
    )
    from megreader_tpu.ops.precision import cast_floats

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=160)  # fused-map res (/4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(__file__.rsplit("/", 2)[0], "runs", "jax_cache"),
    )

    B, H, W, D = args.batch, args.hw, args.hw, args.dim
    head = MapHead(D, dtype=jnp.bfloat16, fused_upsample=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, 256), jnp.bfloat16)
    hv = cast_floats(head.init(rng, jnp.zeros((1, H, W, 256))), jnp.bfloat16)
    p = hv["params"]
    bs = hv["batch_stats"]

    def bn(y, name):
        m, v = bs[name]["mean"], bs[name]["var"]
        s, b = p[name]["scale"], p[name]["bias"]
        y32 = y.astype(jnp.float32)
        out = (y32 - m) * jax.lax.rsqrt(v + 1e-5) * s + b
        return jax.nn.relu(out).astype(y.dtype)

    def conv1(y):
        return jax.lax.conv_general_dilated(
            y, p["conv"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=y.dtype,
        )

    def s_conv1(y):
        return conv1(y)

    def s_bn1(y):
        return bn(conv1(y), "bn")

    def s_up1(y):
        return _fused_upsample_conv(bn(conv1(y), "bn"), p["up1"]["kernel"], None)

    def s_bn2(y):
        return bn(s_up1(y), "bn1")

    def s_up2(y):
        return _fused_upsample_conv(s_bn2(y), p["up2"]["kernel"], p["up2"]["bias"])

    def s_full(y):
        return jax.nn.sigmoid(s_up2(y)[..., 0].astype(jnp.float32))

    def head_apply(y):
        return head.apply(hv, y, train=False)

    # naive (resize->conv) tail for comparison
    def s_naive(y):
        z = bn(conv1(y), "bn")
        z = _resize_to(z, 2 * H, 2 * W)
        z = jax.lax.conv_general_dilated(
            z, p["up1"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=z.dtype,
        )
        z = bn(z, "bn1")
        z = _resize_to(z, 4 * H, 4 * W)
        z = jax.lax.conv_general_dilated(
            z, p["up2"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=z.dtype,
        ) + p["up2"]["bias"]
        return jax.nn.sigmoid(z[..., 0].astype(jnp.float32))

    def slope(fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(y, iters):
            def body(c, _):
                out = fn(y + c.astype(y.dtype) * 1e-6)
                return jnp.sum(out).astype(jnp.float32) * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return out

        def timed(k):
            t0 = time.perf_counter()
            float(loop(x, k))
            return time.perf_counter() - t0

        timed(4)
        timed(24)
        t1 = min(timed(4) for _ in range(3))
        t2 = min(timed(24) for _ in range(3))
        return (t2 - t1) / 20.0

    prev = 0.0
    for name, fn in [
        ("conv1 256->64 @/4", s_conv1),
        ("+bn/relu", s_bn1),
        ("+up1 fused 64->32", s_up1),
        ("+bn1/relu @/2", s_bn2),
        ("+up2 fused 32->1", s_up2),
        ("+sigmoid (full head)", s_full),
    ]:
        ms = slope(fn) * 1e3
        print(f"{name:26s}: {ms:7.2f} ms/batch  (+{ms - prev:6.2f})", flush=True)
        prev = ms

    for name, fn in [
        ("head.apply (module)", head_apply),
        ("naive resize->conv tail", s_naive),
    ]:
        ms = slope(fn) * 1e3
        print(f"{name:26s}: {ms:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
