"""Deformable convolution v2, TPU-native (SURVEY.md §2.6 N1).

The reference ships a ~2k-LoC CUDA extension (deform_conv_cuda) built on
per-pixel gathers. TPUs have no efficient gather, so this is NOT a
translation — the sampling is reformulated as static shifted multiply-adds:

* Offsets are clipped to a bounded radius R (default 2). DCN offsets in
  trained detectors are overwhelmingly sub-pixel to a-few-pixels, and the
  clip keeps the receptive set static.
* A bilinear sample at fractional offset (dy, dx) is separable:
      sample = sum_sy tri(dy - sy) * shift_y( sum_sx tri(dx - sx) *
               shift_x(x, sx), sy )
  where tri(t) = max(0, 1 - |t|) and sy/sx range over the static window
  [-R-1, R+1]. Each term is a roll + VPU multiply — XLA fuses the lot, and
  every FLOP is dense vector work.
* The K sampled taps (K=9 for 3x3) are stacked to (B, H, W, K*C) and
  contracted with the kernel weights in ONE MXU matmul.
* Modulation (DCNv2 sigmoid mask per tap) multiplies the sampled taps.

Cost: 2*(2R+3)*K*C VPU madds per pixel for sampling + the usual K*C*Cout
MXU MACs — bounded, static-shape, gather-free.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _shift2d(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """Shift (B, H, W, C) content by (+sy, +sx) reading direction (i.e.
    result[b, y, x] = x[b, y+sy, x+sx]), zero-padded."""
    B, H, W, C = x.shape
    pad_y = (max(0, -sy), max(0, sy))
    pad_x = (max(0, -sx), max(0, sx))
    padded = jnp.pad(x, ((0, 0), pad_y, pad_x, (0, 0)))
    return jax.lax.dynamic_slice(
        padded, (0, pad_y[0] + sy, pad_x[0] + sx, 0), (B, H, W, C)
    )


def deform_sample(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    modulation: jnp.ndarray,
    kernel: int = 3,
    max_offset: int = 2,
) -> jnp.ndarray:
    """Sample the K deformed taps.

    x: (B, H, W, C); offsets: (B, H, W, 2K) as (dy, dx) per tap;
    modulation: (B, H, W, K) in [0, 1]; returns (B, H, W, K, C).
    """
    B, H, W, C = x.shape
    K = kernel * kernel
    R = max_offset
    half = kernel // 2
    taps = [(ky, kx) for ky in range(-half, half + 1) for kx in range(-half, half + 1)]

    dy = jnp.clip(offsets[..., 0::2], -R, R)  # (B, H, W, K)
    dx = jnp.clip(offsets[..., 1::2], -R, R)

    window = list(range(-R - 1, R + 2))  # static per-tap shift window

    # Precompute row-shifted copies shared across taps/columns; per-pixel
    # bilinear weights tri(t - s) are applied at the OUTPUT position after
    # both shifts (they must not ride along with the shifted content).
    row_shifted = {}

    def rows(sy_abs):
        if sy_abs not in row_shifted:
            row_shifted[sy_abs] = _shift2d(x, sy_abs, 0)
        return row_shifted[sy_abs]

    outs = []
    for k, (ky, kx) in enumerate(taps):
        ty = ky + dy[..., k]  # (B, H, W) absolute fractional row offset
        tx = kx + dx[..., k]
        acc = 0.0
        for sy in window:
            sy_abs = ky + sy
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty - sy_abs))  # (B, H, W)
            inner = 0.0
            for sx in window:
                sx_abs = kx + sx
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(tx - sx_abs))
                inner = inner + wx[..., None] * _shift2d(rows(sy_abs), 0, sx_abs)
            acc = acc + wy[..., None] * inner
        outs.append(acc * modulation[..., k, None])
    return jnp.stack(outs, axis=3)  # (B, H, W, K, C)


class DeformableConv(nn.Module):
    """DCNv2 block: offset/modulation conv + deformed sampling + MXU matmul."""

    features: int
    kernel: int = 3
    max_offset: int = 2
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        K = self.kernel * self.kernel
        # Offset/mask head — zero-init so the block starts as a plain conv
        # (standard DCN practice; keeps converted checkpoints sane).
        om = nn.Conv(
            3 * K,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_conv",
        )(x)
        offsets = om[..., : 2 * K]
        modulation = jax.nn.sigmoid(om[..., 2 * K :])

        sampled = deform_sample(
            x, offsets, modulation, kernel=self.kernel, max_offset=self.max_offset
        )  # (B, H, W, K, C)
        B, H, W, _, C = sampled.shape
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K * C, self.features),
        )
        out = sampled.reshape(B, H, W, K * C) @ w  # one MXU contraction
        if self.stride != (1, 1):
            out = out[:, :: self.stride[0], :: self.stride[1], :]
        return out
