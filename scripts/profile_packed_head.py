#!/usr/bin/env python
"""Packed serving head sub-op breakdown (640², batch 8, bf16).

profile_head.py times the FULL-mode tail; the serving path is the packed
tail (phases-as-channels, one depth-to-space(4)). This slope-times the
packed path's stages: conv1 -> bn -> up1 packed -> bn1 -> up2 packed2
interior -> +d2s -> +borders -> +sigmoid, to attribute the ~1.5 ms gap
between the measured 2.79 ms head.apply and the ~1.3 ms component SOL.
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/runs/jax_cache"
    )

    from megreader_tpu.models.detector import (
        MapHead,
        _packed2_kernel,
        _phase_conv_packed,
    )
    from megreader_tpu.ops.precision import cast_floats

    B, H, W, D = 8, 160, 160, 64
    head = MapHead(D, dtype=jnp.bfloat16, fused_upsample=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, 256), jnp.bfloat16)
    hv = cast_floats(head.init(rng, jnp.zeros((1, H, W, 256))), jnp.bfloat16)
    p, bs = hv["params"], hv["batch_stats"]

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

    def s_bn(y):
        return bn(conv1(y), "bn")

    def s_up1p(y):
        return _phase_conv_packed(s_bn(y), p["up1"]["kernel"], None)

    def s_bn1(y):
        return bn(s_up1p(y), "bn1")

    K2 = _packed2_kernel(p["up2"]["kernel"])

    def packed2_interior(v):
        vf = v.reshape(B, H, W, 4 * 32)
        vr = jnp.pad(vf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        z = jax.lax.conv_general_dilated(
            vr, K2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=vf.dtype,
        ) + jnp.tile(p["up2"]["bias"], 16)
        return z

    def s_up2_nod2s(y):
        return packed2_interior(s_bn1(y))  # (B, H, W, 16)

    def s_up2_d2s(y):
        z = s_up2_nod2s(y).reshape(B, H, W, 4, 4, 1)
        return jnp.transpose(z, (0, 1, 3, 2, 4, 5)).reshape(
            B, 4 * H, 4 * W, 1
        )

    def s_module(y):
        return head.apply(hv, y, train=False)

    from megreader_tpu.models.detector import (
        _packed2_border_kernels, _packed2_conv_exact, _stage1_borders,
    )

    def s_up1p_exact(y):
        s = s_bn(y)
        v = _phase_conv_packed(s, p["up1"]["kernel"], None)
        return _stage1_borders(s, p["up1"]["kernel"], None, v)

    def s_bn1_exact(y):
        return bn(s_up1p_exact(y), "bn1")

    def s_up2_exact(y):
        return _packed2_conv_exact(
            s_bn1_exact(y).reshape(B, H, W, 2, 2, 32),
            p["up2"]["kernel"], p["up2"]["bias"],
        )

    def s_borderk_only(y):
        bk = _packed2_border_kernels(p["up2"]["kernel"] + y[0, 0, 0, 0])
        return sum(jnp.sum(k) for k in bk.values())

    head_strips = MapHead(
        D, dtype=jnp.bfloat16, fused_upsample=True, analytic_borders=False
    )

    def s_module_strips(y):
        return head_strips.apply(hv, y, train=False)

    def slope(fn, label):
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
        ms = min(
            (b - a) / 20 * 1e3
            for a, b in zip(
                [timed(4) for _ in range(3)], [timed(24) for _ in range(3)]
            )
        )
        print(f"{label:<28}: {ms:7.2f} ms/batch")
        return ms

    slope(conv1, "conv1 256->64")
    slope(s_bn, "+bn/relu")
    slope(s_up1p, "+up1 packed (->128ch)")
    slope(s_bn1, "+bn1/relu packed")
    slope(s_up2_nod2s, "+up2 packed2 (no d2s)")
    slope(s_up2_d2s, "+d2s(4)")
    slope(s_module, "head.apply (analytic borders)")
    slope(s_module_strips, "head.apply (strip recompute)")
    slope(s_up1p_exact, "up1 packed_exact (st1 borders)")
    slope(s_up2_exact, "+up2 packed2_exact")
    slope(s_borderk_only, "border-kernel build alone")


if __name__ == "__main__":
    main()
