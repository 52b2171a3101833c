"""ResNet backbones (flax, NHWC) — detection and recognition flavors.

Rebuilds the role of MegReader's ``backbones/resnet.py`` [U]: ResNet-18/34/50
with (a) a detection flavor returning the C2–C5 pyramid for FPN heads and
(b) a recognition flavor whose later stages stride only in height so a
32×100 word crop ends as a width-25 sequence of features.

TPU-first choices:
* NHWC layout throughout (XLA's preferred conv layout on TPU).
* Explicit torch-style padding (``((1,1),(1,1))`` etc.) rather than SAME so a
  torch checkpoint converted by ``compat.torch_convert`` reproduces
  activations exactly — required for the bit-for-bit greedy-decode parity
  target (BASELINE.json north_star).
* BatchNorm with stored running stats (eval default); training mode threads
  mutable batch_stats as usual in flax.
* Deformable variants plug in via ``ops.deform`` sampling (DCN stages), the
  TPU equivalent of the reference's CUDA extension (SURVEY.md §2.6 N1).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _StemKernel(nn.Module):
    """Bare kernel param in an ``nn.Conv``-compatible scope ("<name>/kernel",
    lecun_normal init) so the space-to-depth stem shares checkpoints with
    the direct 7×7 conv."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


def _bn(y, train, name, out_dtype):
    """BatchNorm normalizing in fp32, activations returned in ``out_dtype``.

    BN statistics/affine run fp32 for numerical stability, but the result is
    cast straight back to the surrounding compute dtype. Without the cast, a
    forced ``dtype=float32`` BN upcasts every post-BN activation, and the
    next conv (dtype=None -> promote(bf16 kernel, fp32 input)) silently runs
    the MXU in fp32 — in a fully-bf16-cast serving tree the whole trunk
    serves at half throughput (round-2 regression: 76.4k -> 59.7k crops/s).
    """
    y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name=name)(y)
    return y.astype(out_dtype)


def _conv(features, kernel, stride, name=None, use_bias=False, dtype=None):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=stride if isinstance(stride, tuple) else (stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """2×(3×3 conv) residual block (ResNet-18/34); optional DCNv2 conv2.

    ``dtype``: conv compute dtype (bf16 for mixed-precision training —
    params stay fp32, BatchNorm normalizes in fp32).
    """

    features: int
    stride: Tuple[int, int] = (1, 1)
    expansion: int = 1
    use_dcn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        dt = self.dtype if self.dtype is not None else x.dtype
        y = _conv(self.features, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        y = _bn(y, train, "bn1", dt)
        y = nn.relu(y)
        if self.use_dcn:
            from .deform import DeformableConv

            y = DeformableConv(self.features, name="conv2")(y)
        else:
            y = _conv(self.features, 3, (1, 1), name="conv2", dtype=self.dtype)(y)
        y = _bn(y, train, "bn2", dt)
        if residual.shape[-1] != self.features or self.stride != (1, 1):
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=self.stride,
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = _bn(residual, train, "downsample_bn", dt)
        return nn.relu(y + residual.astype(dt))


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 residual block (ResNet-50/101), expansion 4.

    ``use_dcn`` swaps the 3×3 conv2 for DCNv2 — the reference's deformable
    ResNet-50/101 configuration (SURVEY.md §2.6 N1). In strided blocks the
    deformable conv carries the block's stride (computed dense, output
    subsampled — same math as a strided DCN, marginal extra FLOPs on the
    few strided blocks).
    """

    features: int
    stride: Tuple[int, int] = (1, 1)
    expansion: int = 4
    use_dcn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        residual = x
        dt = self.dtype if self.dtype is not None else x.dtype
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _bn(y, train, "bn1", dt)
        y = nn.relu(y)
        if self.use_dcn:
            from .deform import DeformableConv

            y = DeformableConv(self.features, stride=self.stride, name="conv2")(y)
        else:
            y = _conv(self.features, 3, self.stride, name="conv2", dtype=self.dtype)(y)
        y = _bn(y, train, "bn2", dt)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = _bn(y, train, "bn3", dt)
        if residual.shape[-1] != out_ch or self.stride != (1, 1):
            residual = nn.Conv(
                out_ch, (1, 1), strides=self.stride, use_bias=False, dtype=self.dtype,
                name="downsample_conv"
            )(x)
            residual = _bn(residual, train, "downsample_bn", dt)
        return nn.relu(y + residual.astype(dt))


class ResNet(nn.Module):
    """Configurable ResNet trunk.

    variant='det': ImageNet-style stem (7×7 s2 + maxpool s2); stage strides
      (1,2,2,2); returns (C2, C3, C4, C5) at strides 4/8/16/32.
    variant='rec': word-crop stem (3×3 s1 + 2×2 maxpool); stage strides
      (1, (2,2), (2,1), (2,1)) so a 32×100 input ends at H=2, W=25; returns
      the final feature map only.
    variant='rec2d': like 'rec' but preserves height for 2D-CTC heads —
      stage strides (1, (2,2), (2,1), (1,1)): 32×100 -> H=4, W=25. The 2-D
      prob map keeps vertical resolution so curved text needn't collapse to
      one row (arXiv:1907.09705).
    """

    block: Any = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    variant: str = "det"
    width: int = 64
    #: 1-based stage indices whose blocks use deformable conv2 (the
    #: reference's deformable-ResNet swaps 3x3 convs in later stages).
    dcn_stages: Sequence[int] = ()
    #: conv compute dtype — jnp.bfloat16 enables mixed-precision training
    #: (params fp32, MXU convs bf16, BatchNorm fp32). None = fp32.
    dtype: Any = None
    #: det-variant stem as an EXACT space-to-depth rewrite: the 7×7 s2 conv
    #: on a 3-channel image packs C=3 into the 128-lane minor dim (125/128
    #: lanes idle on every load); rearranging 2×2 pixel phases into channels
    #: (H,W,3)→(H/2,W/2,12) turns it into a 4×4 s1 conv on 12 channels with
    #: the SAME 7×7 parameter (transformed in-graph, zero-padded taps), so
    #: checkpoints/converters/tests are unchanged. Equality-tested vs the
    #: direct conv (tests/test_detector.py::test_s2d_stem_exact).
    stem_s2d: bool = False
    #: det-variant stem as a 4×4 space-to-depth rewrite THROUGH the
    #: maxpool (round-5, profile-guided): the trace showed the direct 7×7
    #: stem at 2.09 ms/batch-8 — 3.7% MFU, 20% of the whole detector —
    #: because Cin=3 leaves 125/128 MXU lanes idle, and the 2× ``stem_s2d``
    #: rewrite measured SLOWER because its GEMM N=64 still wasted half
    #: the array and it materialized the 320² intermediate. This variant
    #: packs 4×4 phases (48 input channels), emits both stride-2 output
    #: row/col phases as channels (K=9·48=432→512 pad, N=4·64=256 — full
    #: tiles), applies BN+relu per base channel on the packed tensor, and
    #: computes the 3×3/s2 maxpool as 3 shifted maxes over phases, so the
    #: 320² feature map never exists in HBM. Same "stem_conv/kernel"
    #: param (transformed in-graph) — checkpoints interchange. Equality-
    #: tested vs the direct chain incl. borders.
    stem_s2d4: bool = False

    def _stem_s2d4(self, x, train, dt):
        """7×7/s2 conv + BN + relu + 3×3/s2 maxpool, all at H/4 resolution.

        Index math: output 320²-row Y = 2m + q (m: 160² row, q: phase)
        with tap dy∈[-3,3] reads input row 4m + 4(a-1) + ρ (a: packed
        kernel row, ρ: input phase), so dy = 4(a-1) + ρ - 2q — a (3,4,2)
        tap scatter per axis, zeros where |dy|>3. Maxpool window for
        160²-row m is {2m-1, 2m, 2m+1} = {q1[m-1], q0[m], q1[m]}.
        """
        B, H, W, C = x.shape
        width = self.width
        w7 = _StemKernel((7, 7, C, width), name="stem_conv")()
        # dy = 4(a-1) + rho - 2q ∈ [-6, 7]; pad w7 rows/cols to index dy+6
        w14 = jnp.pad(w7, ((3, 4), (3, 4), (0, 0), (0, 0)))
        j = (
            4 * (np.arange(3)[:, None, None] - 1)
            + np.arange(4)[None, :, None]
            - 2 * np.arange(2)[None, None, :]
            + 6
        )  # (a, rho, q)
        wp = w14[j][:, :, :, j]  # (a, rr, q, b, rc, t, C, co)
        wp = wp.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
            3, 3, 16 * C, 4 * width
        )  # (a, b, (rr, rc, ci), (q, t, co))

        xs = x.reshape(B, H // 4, 4, W // 4, 4, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)
        if self.dtype is not None:
            xs = xs.astype(self.dtype)
            wp = wp.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            xs, wp, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H/4, W/4, 4*width)
        h, w = H // 4, W // 4
        y = _bn(y.reshape(B, h, w, 4, width), train, "stem_bn", dt)
        y = nn.relu(y).reshape(B, h, w, 2, 2, width)  # (.., q, t, co)
        neg = jnp.asarray(-jnp.inf, y.dtype)
        q0, q1 = y[:, :, :, 0], y[:, :, :, 1]  # (B, h, w, 2, width)
        q1u = jnp.concatenate(
            [jnp.full_like(q1[:, :1], neg), q1[:, :-1]], axis=1
        )
        rm = jnp.maximum(jnp.maximum(q0, q1), q1u)  # (B, h, w, 2, width)
        t0, t1 = rm[..., 0, :], rm[..., 1, :]
        t1l = jnp.concatenate(
            [jnp.full_like(t1[:, :, :1], neg), t1[:, :, :-1]], axis=2
        )
        return jnp.maximum(jnp.maximum(t0, t1), t1l)  # (B, h, w, width)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype if self.dtype is not None else x.dtype
        if self.variant == "det":
            if self.stem_s2d4:
                y = self._stem_s2d4(x, train, dt)  # through the maxpool
            elif self.stem_s2d:
                B, H, W, C = x.shape
                # same scope/param ("stem_conv/kernel", same lecun_normal
                # init) as the nn.Conv branch — checkpoints interchange
                w7 = _StemKernel((7, 7, C, self.width), name="stem_conv")()
                # phases-to-channels: X[r,c,(pr,pc,ch)] = x[2r+pr, 2c+pc, ch]
                xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
                xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, H // 2, W // 2, 4 * C
                )
                # output row i consumes input rows 2i-3..2i+3 = s2d rows
                # i-2..i+1 → 4 taps, pad (2,1); tap (ro,pr) reads w7 row
                # 2ro+pr-1 (row -1 is the zero-pad)
                w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
                w4 = w8.reshape(4, 2, 4, 2, C, self.width)
                w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(
                    4, 4, 4 * C, self.width
                )
                if self.dtype is not None:
                    xs = xs.astype(self.dtype)
                    w4 = w4.astype(self.dtype)
                y = jax.lax.conv_general_dilated(
                    xs, w4, window_strides=(1, 1),
                    padding=((2, 1), (2, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                y = nn.Conv(
                    self.width,
                    (7, 7),
                    strides=(2, 2),
                    padding=((3, 3), (3, 3)),
                    use_bias=False,
                    dtype=self.dtype,
                    name="stem_conv",
                )(x)
            if not self.stem_s2d4:
                y = _bn(y, train, "stem_bn", dt)
                y = nn.relu(y)
                y = nn.max_pool(
                    y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )
            stage_strides = [(1, 1), (2, 2), (2, 2), (2, 2)]
        elif self.variant in ("rec", "rec2d"):
            y = _conv(self.width, 3, (1, 1), name="stem_conv", dtype=self.dtype)(x)
            y = _bn(y, train, "stem_bn", dt)
            y = nn.relu(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            if self.variant == "rec":
                stage_strides = [(1, 1), (2, 2), (2, 1), (2, 1)]
            else:
                stage_strides = [(1, 1), (2, 2), (2, 1), (1, 1)]
        else:
            raise ValueError(f"unknown variant {self.variant!r}")

        feats = []
        for i, (n_blocks, stride) in enumerate(zip(self.stage_sizes, stage_strides)):
            kw = {}
            if (i + 1) in tuple(self.dcn_stages):
                kw["use_dcn"] = True
            for j in range(n_blocks):
                y = self.block(
                    features=self.width * (2**i),
                    stride=stride if j == 0 else (1, 1),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_block{j}",
                    **kw,
                )(y, train=train)
            feats.append(y)

        if self.variant == "det":
            return tuple(feats)  # C2..C5
        return y


def resnet_variant(name: str, variant: str = "det", **kw) -> "ResNet":
    factories = {
        "resnet18": resnet18,
        "resnet34": resnet34,
        "resnet50": resnet50,
        "resnet101": resnet101,
    }
    return factories[name](variant=variant, **kw)


def resnet18(variant="det", **kw):
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), variant=variant, **kw)


def resnet34(variant="det", **kw):
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3), variant=variant, **kw)


def resnet50(variant="det", **kw):
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), variant=variant, **kw)


def resnet101(variant="det", **kw):
    """ResNet-101 (SURVEY.md §2.3: the reference family is 18/34/50/101)."""
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 23, 3), variant=variant, **kw)
