"""int8 serving path — Flax method interception, no model-code changes.

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 TOPS),
and the serving recognizer/detector are MXU-bound (BENCH_r04: rec MFU
0.55 bf16, det trunk the ceiling at 0.275) — so the next 2x is precision,
not scheduling (VERDICT r4 tasks #4/#5). The reference has no analog
(CUDA fp32/fp16 throughout; SURVEY.md §6 perf notes); this is a TPU-first
extension of the serving stack.

Design: ``nn.intercept_methods`` swaps every ``nn.Conv``/``nn.Dense``
``__call__`` for an int8 kernel at trace time:

- weights: symmetric per-output-channel scales (max|w|/127). Quantization
  happens inside the traced graph (a few elementwise ops over ~10M params
  per forward — noise next to the conv FLOPs), so checkpoints stay fp32
  and nothing about loading changes.
- activations: dynamic symmetric per-tensor scale (max|x|/127) computed
  on the fly — one VPU reduction per conv, no calibration pass needed.
- compute: ``lax.conv_general_dilated`` / ``dot_general`` on int8 operands
  with ``preferred_element_type=int32`` (the MXU-native accumulate), then
  a single fused dequant multiply.

Raw-param modules (LSTM w_ih/w_hh, the packed detector tail's composed
kernels) are NOT intercepted — they are either scan-recurrent (int8
recurrence would need per-step requantization) or already phase-packed;
the conv trunks they sit on top of are where the FLOPs are.

Usage::

    from megreader_tpu.ops.quantize import int8_methods
    fwd = jax.jit(lambda v, x: int8_methods(model.apply)(v, x))

``skip_names``: module names to keep in the original dtype (e.g. the
detector's final logit conv if the quality gate demands it).
"""

from __future__ import annotations

from typing import Callable, FrozenSet

import flax.linen as nn
import jax
import jax.numpy as jnp


def _qscale_last(w: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-last-axis-channel scales, guarded against dead rows."""
    red = tuple(range(w.ndim - 1))
    return jnp.maximum(jnp.max(jnp.abs(w), axis=red) / 127.0, 1e-8)


def _qtensor(x: jnp.ndarray):
    """Dynamic symmetric per-tensor quant: (int8 values, fp32 scale)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _conv_int8(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """nn.Conv.__call__ replacement for the subset this repo uses
    (NHWC, tuple kernel_size, no input/kernel dilation)."""
    ks = tuple(mod.kernel_size)
    in_features = x.shape[-1]
    kshape = ks + (in_features // mod.feature_group_count, mod.features)
    kernel = mod.param("kernel", mod.kernel_init, kshape, mod.param_dtype)

    wf = kernel.astype(jnp.float32)
    sk = _qscale_last(wf)  # (features,)
    wq = jnp.clip(jnp.round(wf / sk), -127.0, 127.0).astype(jnp.int8)
    xq, sx = _qtensor(x)

    strides = mod.strides or (1,) * len(ks)
    if isinstance(strides, int):
        strides = (strides,) * len(ks)
    padding = mod.padding
    if isinstance(padding, int):
        padding = ((padding, padding),) * len(ks)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sk)
    if mod.use_bias:
        bias = mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
        y = y + bias.astype(jnp.float32)
    out_dt = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dt)


def _dense_int8(mod: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    in_features = x.shape[-1]
    kernel = mod.param(
        "kernel", mod.kernel_init, (in_features, mod.features), mod.param_dtype
    )
    wf = kernel.astype(jnp.float32)
    sk = _qscale_last(wf)
    wq = jnp.clip(jnp.round(wf / sk), -127.0, 127.0).astype(jnp.int8)
    xq, sx = _qtensor(x)
    y = jax.lax.dot_general(
        xq,
        wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sk)
    if mod.use_bias:
        bias = mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
        y = y + bias.astype(jnp.float32)
    out_dt = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dt)


def _make_interceptor(skip_names: FrozenSet[str]):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or mod.name in skip_names:
            return next_fun(*args, **kwargs)
        if type(mod) is nn.Conv:
            return _conv_int8(mod, args[0])
        if type(mod) is nn.Dense:
            return _dense_int8(mod, args[0])
        return next_fun(*args, **kwargs)

    return interceptor


def int8_context(skip_names: FrozenSet[str] = frozenset()):
    """Context manager form: every nn.Conv / nn.Dense traced inside runs
    the int8 MXU path (for call sites that pick a decode fn dynamically)."""
    return nn.intercept_methods(_make_interceptor(skip_names))


def int8_methods(
    fn: Callable, skip_names: FrozenSet[str] = frozenset()
) -> Callable:
    """Wrap an ``apply``-style callable so every nn.Conv / nn.Dense inside
    runs the int8 MXU path. Trace-time rewrite; params stay fp32."""

    def wrapped(*args, **kwargs):
        with int8_context(skip_names):
            return fn(*args, **kwargs)

    return wrapped
