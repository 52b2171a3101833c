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
import jax.numpy as jnp


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

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype if self.dtype is not None else x.dtype
        if self.variant == "det":
            y = nn.Conv(
                self.width,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                dtype=self.dtype,
                name="stem_conv",
            )(x)
            y = _bn(y, train, "stem_bn", dt)
            y = nn.relu(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
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
