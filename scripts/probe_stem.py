#!/usr/bin/env python
"""Feasibility probes for a Pallas stem kernel (normalize->7x7/s2->BN->relu
->3x3/s2 maxpool fused).

The round-5 trace attributes ~3.0 ms of the 9.0 ms serving detector to the
stem chain (input layout copy 0.59 + 7x7 conv 2.09 + maxpool fusion 0.29),
and both space-to-depth rewrites measured SLOWER because XLA repacks in
HBM. Before building the kernel, measure the pieces the design depends on:

  1. XLA prep variants feeding the kernel (pad+normalize NHWC; + channel-
     plane transpose) — if the transpose costs ~1 ms the NCHW plan dies.
  2. The reference stem chain cost in isolation (what the kernel replaces).

Slope-timed (two iteration counts inside one jitted lax.scan) so the ~30 ms
axon tunnel RTT cancels.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/jax_cache")

MEAN = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
STD = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)


def slope_ms(fn, x, iters=(4, 20), reps=3):
    """ms per application of fn, dispatch overhead cancelled.

    fn maps x -> y (any shape); scan over applications by feeding x each
    step and accumulating a scalar tap of the output (keeps fn live).
    """
    def make(n):
        @jax.jit
        def run(x):
            def body(acc, _):
                y = fn(x)
                return acc + jnp.sum(y[..., :1, :1].astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return acc
        return run

    lo, hi = (make(n) for n in iters)
    lo(x).block_until_ready(), hi(x).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); lo(x).block_until_ready()
        t1 = time.perf_counter(); hi(x).block_until_ready()
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (iters[1] - iters[0]))
    return best * 1e3


def main():
    B, H, W = 8, 640, 640
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3)) * 255.0

    def norm(x):
        return ((x - MEAN) / STD).astype(jnp.bfloat16)

    def prep_nhwc(x):
        y = norm(x)
        return jnp.pad(y, ((0, 0), (5, 3), (5, 3), (0, 0)))

    def prep_nchw(x):
        return jnp.transpose(prep_nhwc(x), (0, 3, 1, 2))

    # the chain the kernel would replace (conv weights fixed)
    k7 = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64), jnp.bfloat16)
    scale = jax.random.uniform(jax.random.PRNGKey(2), (64,), jnp.float32) + .5
    bias = jax.random.normal(jax.random.PRNGKey(3), (64,), jnp.float32)

    def ref_chain(x):
        y = norm(x)
        y = jax.lax.conv_general_dilated(
            y, k7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = (y.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16)
        y = jax.nn.relu(y)
        return jax.lax.reduce_window(
            y, jnp.asarray(-jnp.inf, y.dtype), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])

    for name, fn in [("prep_nhwc (pad+norm)", prep_nhwc),
                     ("prep_nchw (+transpose)", prep_nchw),
                     ("ref stem chain (norm+conv+bn+relu+pool)", ref_chain)]:
        print(f"{name:42s}: {slope_ms(fn, x):7.3f} ms/batch-{B}")


if __name__ == "__main__":
    main()
