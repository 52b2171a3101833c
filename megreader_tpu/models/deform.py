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

PARITY CAVEAT (checkpoint conversion): the offset clip at ±``max_offset``
is a deliberate semantic divergence from the reference CUDA kernel, which
samples at unbounded offsets. A converted reference DCN checkpoint whose
*learned* offsets exceed ``max_offset`` will silently produce different
activations. Use ``dcn_offset_saturation`` on representative inputs after
converting such a checkpoint — if the saturation fraction is material
(>~1%), raise ``max_offset`` (cost grows linearly in 2R+3) instead of
accepting the drift.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

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


def roi_pool_bilinear(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    bin_offsets: Optional[jnp.ndarray],
    out_size: int = 7,
    sample_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """RoI average pooling with optional per-bin deformation offsets.

    The sampling half of the reference's ``DeformRoIPooling`` CUDA op
    (SURVEY.md §2.6 N1): each RoI is divided into ``out_size``×``out_size``
    bins; each bin averages ``sample_ratio``² bilinear samples taken at the
    bin's uniform sub-grid, displaced by that bin's (dy, dx) offset.

    features: (H, W, C) one image's feature map.
    rois: (R, 4) boxes (x0, y0, x1, y1) in input-image coords
      (multiplied by ``spatial_scale`` to reach feature coords).
    out_size: int k (square k×k bins) or (kh, kw) — text RoIs pool into
      wide rectangles (e.g. (4, 32)) whose width becomes the CTC time axis.
    bin_offsets: (R, kh, kw, 2) as (dy, dx) in *normalized* RoI
      units (reference convention: offsets scale with RoI height/width), or
      None for plain RoI align.
    Returns (R, kh, kw, C).

    Unlike the conv path, this is a per-RoI op outside the dense hot loop
    (R·k²·g² ≈ 10⁴ samples), so a vectorized bilinear gather is the right
    tool — reformulating to tent matmuls would materialize (R,k²,g,H)
    weights for no win.
    """
    H, W, C = features.shape
    R = rois.shape[0]
    kh, kw = (out_size, out_size) if isinstance(out_size, int) else out_size
    g = sample_ratio
    x0, y0, x1, y1 = [rois[:, i] * spatial_scale for i in range(4)]
    rw = jnp.maximum(x1 - x0, 0.1)  # (R,)
    rh = jnp.maximum(y1 - y0, 0.1)
    bw = rw / kw
    bh = rh / kh

    # Sub-grid sample positions per bin: bin (i, j), sample (u, v).
    bi = jax.lax.broadcasted_iota(jnp.float32, (kh, kw, g, g), 0)
    bj = jax.lax.broadcasted_iota(jnp.float32, (kh, kw, g, g), 1)
    su = jax.lax.broadcasted_iota(jnp.float32, (kh, kw, g, g), 2)
    sv = jax.lax.broadcasted_iota(jnp.float32, (kh, kw, g, g), 3)
    # y = y0 + (i + (u+0.5)/g) * bh ; x analogous.
    ys = y0[:, None, None, None, None] + (bi + (su + 0.5) / g)[None] * bh[:, None, None, None, None]
    xs = x0[:, None, None, None, None] + (bj + (sv + 0.5) / g)[None] * bw[:, None, None, None, None]
    if bin_offsets is not None:
        ys = ys + (bin_offsets[..., 0] * rh[:, None, None])[..., None, None]
        xs = xs + (bin_offsets[..., 1] * rw[:, None, None])[..., None, None]

    flat_y = ys.reshape(R, kh * kw * g * g)
    flat_x = xs.reshape(R, kh * kw * g * g)
    x0i = jnp.floor(flat_x)
    y0i = jnp.floor(flat_y)
    dx = (flat_x - x0i)[..., None]
    dy = (flat_y - y0i)[..., None]
    x0c = x0i.astype(jnp.int32)
    y0c = y0i.astype(jnp.int32)

    def at(yi, xi):
        v = features[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        return v * inside[..., None]

    v = (
        at(y0c, x0c) * (1 - dx) * (1 - dy)
        + at(y0c, x0c + 1) * dx * (1 - dy)
        + at(y0c + 1, x0c) * (1 - dx) * dy
        + at(y0c + 1, x0c + 1) * dx * dy
    )  # (R, kh*kw*g*g, C)
    return jnp.mean(v.reshape(R, kh, kw, g * g, C), axis=3)


class DeformRoIPooling(nn.Module):
    """Modulated deformable RoI pooling (reference ``DeformRoIPoolingPack``).

    Two-stage: (1) plain RoI-align pool; (2) a small FC head on the pooled
    features predicts per-bin offsets (and a modulation mask), then the
    final pool samples at the deformed positions. Offset head is zero-init
    so the module starts as standard RoI align (reference practice, keeps
    converted checkpoints sane).
    """

    #: int k (square) or (kh, kw) bin grid — wide grids for text RoIs.
    out_size: Any = 7
    sample_ratio: int = 2
    spatial_scale: float = 1.0
    #: reference gamma: offsets are predicted in normalized RoI units and
    #: scaled by this factor before use.
    trans_std: float = 0.1
    modulated: bool = True
    hidden: int = 256

    @nn.compact
    def __call__(self, features: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        k = self.out_size
        kh, kw = (k, k) if isinstance(k, int) else tuple(k)
        base = roi_pool_bilinear(
            features, rois, None, (kh, kw), self.sample_ratio, self.spatial_scale
        )  # (R, kh, kw, C)
        R = base.shape[0]
        h = nn.Dense(self.hidden, name="trans_fc1")(base.reshape(R, -1))
        h = nn.relu(h)
        n_out = kh * kw * (3 if self.modulated else 2)
        trans = nn.Dense(
            n_out,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="trans_fc2",
        )(h)
        offsets = trans[:, : kh * kw * 2].reshape(R, kh, kw, 2) * self.trans_std
        out = roi_pool_bilinear(
            features, rois, offsets, (kh, kw), self.sample_ratio, self.spatial_scale
        )
        if self.modulated:
            mask = jax.nn.sigmoid(trans[:, kh * kw * 2 :].reshape(R, kh, kw, 1))
            out = out * mask
        return out


def dcn_offset_saturation(
    offsets: jnp.ndarray, max_offset: int = 2
) -> Dict[str, jnp.ndarray]:
    """Offset-clip diagnostics for checkpoint-parity validation.

    offsets: (B, H, W, 2K) raw offset activations (the ``offset_conv``
    output, pre-clip). Returns scalars: ``frac_clipped`` (fraction of
    offset components beyond ±max_offset — activations the clip alters),
    ``max_abs`` and ``p99_abs``. Convert a reference DCN checkpoint, run
    its offset convs on real images, and check frac_clipped ~ 0 before
    trusting activation parity (see module docstring).
    """
    a = jnp.abs(offsets.astype(jnp.float32))
    return {
        "frac_clipped": jnp.mean((a > max_offset).astype(jnp.float32)),
        "max_abs": jnp.max(a),
        "p99_abs": jnp.quantile(a.reshape(-1), 0.99),
    }


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
