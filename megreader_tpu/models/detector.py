"""FPN segmentation text detector (judged config #4).

Rebuilds the reference's ``decoders/seg_detector.py`` [U] (SURVEY.md §2.4):
ResNet C2–C5 pyramid -> FPN top-down fusion -> concatenated multi-scale
feature -> per-pixel heads. We produce the DB-style pair (probability map +
threshold map) with differentiable binarization — MegReader's segmentation
detector lineage (its descendant DBNet shares the framework skeleton) — and
train with balanced BCE + dice + masked L1.

TPU-first: NHWC, bilinear resizes via jax.image (XLA fuses them), no
dynamic shapes; all postprocessing lives in ops/ccl.py on device.

Output maps are at input resolution (stride 1), shape (B, H, W).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import register
from ..ops.losses import balanced_bce_loss, dice_loss, masked_l1_loss
from .resnet import resnet_variant


def _resize_to(x, h, w, method="bilinear"):
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method=method)


class FPNNeck(nn.Module):
    """Top-down FPN: laterals to `dim`, upsample+add, smooth, concat at /4."""

    dim: int = 256
    out_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        c2, c3, c4, c5 = feats
        dt = self.dtype
        p5 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat5")(c5)
        p4 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat4")(c4) + _resize_to(
            p5, c4.shape[1], c4.shape[2]
        )
        p3 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat3")(c3) + _resize_to(
            p4, c3.shape[1], c3.shape[2]
        )
        p2 = nn.Conv(self.dim, (1, 1), dtype=dt, name="lat2")(c2) + _resize_to(
            p3, c2.shape[1], c2.shape[2]
        )
        q = self.out_dim // 4
        h, w = c2.shape[1], c2.shape[2]
        outs = []
        for i, p in enumerate([p2, p3, p4, p5]):
            s = nn.Conv(q, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name=f"smooth{i + 2}")(p)
            outs.append(_resize_to(s, h, w))
        return jnp.concatenate(outs, axis=-1)  # (B, H/4, W/4, out_dim)


class MapHead(nn.Module):
    """conv3x3 -> BN -> relu -> 2× upsample-conv -> 1-channel sigmoid map."""

    dim: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn")(y)
        y = nn.relu(y)
        B, h, w, _ = y.shape
        y = _resize_to(y, h * 2, w * 2)
        y = nn.Conv(self.dim // 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=dt, name="up1")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = _resize_to(y, h * 4, w * 4)
        y = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="up2")(y)
        return jax.nn.sigmoid(y[..., 0].astype(jnp.float32))  # (B, H, W) fp32


class SegDetectorNet(nn.Module):
    num_backbone: str = "resnet18"
    fpn_dim: int = 256
    head_dim: int = 64
    k: float = 50.0  # differentiable-binarization steepness
    width: int = 64  # trunk base width
    #: conv compute dtype (bf16 = mixed-precision training; maps/loss fp32)
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = resnet_variant(
            self.num_backbone, "det", width=self.width, dtype=self.dtype
        )(images, train=train)
        fused = FPNNeck(self.fpn_dim, self.fpn_dim, dtype=self.dtype, name="fpn")(feats)
        prob = MapHead(self.head_dim, dtype=self.dtype, name="prob_head")(fused, train=train)
        thresh = MapHead(self.head_dim, dtype=self.dtype, name="thresh_head")(fused, train=train)
        binary = jax.nn.sigmoid(self.k * (prob - thresh))
        return {"prob": prob, "thresh": thresh, "binary": binary}


@register
class SegDetector:
    """Task wrapper: loss over prob/thresh/binary maps, map inference."""

    def __init__(
        self,
        backbone: str = "resnet18",
        fpn_dim: int = 256,
        head_dim: int = 64,
        k: float = 50.0,
        bce_scale: float = 5.0,
        l1_scale: float = 10.0,
        negative_ratio: float = 3.0,
        width: int = 64,
        compute_dtype: str = "float32",  # 'float32' | 'bfloat16'
    ):
        self.net = SegDetectorNet(
            backbone, fpn_dim, head_dim, k, width,
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        )
        self.bce_scale = bce_scale
        self.l1_scale = l1_scale
        self.negative_ratio = negative_ratio

    def init(self, rng, sample_images):
        return self.net.init(rng, sample_images, train=False)

    def apply(self, variables, images, train: bool = False, mutable=False):
        return self.net.apply(variables, images, train=train, mutable=mutable)

    def loss(self, variables, batch, train: bool = True, rngs=None):
        """batch keys (all (B,H,W) float32 unless noted):
        image (B,H,W,3); gt: shrunk text mask; mask: valid-region mask
        (ignores excluded); thresh_map, thresh_mask: threshold-map target
        and its support (text-border band).
        """
        out = self.net.apply(
            variables,
            batch["image"],
            train=train,
            mutable=["batch_stats"] if train else False,
            rngs=rngs,
        )
        maps, new_state = out if train else (out, {})
        bce = balanced_bce_loss(
            maps["prob"], batch["gt"], batch["mask"], self.negative_ratio
        )
        dice = dice_loss(maps["binary"], batch["gt"], batch["mask"])
        l1 = masked_l1_loss(maps["thresh"], batch["thresh_map"], batch["thresh_mask"])
        total = self.bce_scale * bce + dice + self.l1_scale * l1
        metrics = {"loss": total, "bce": bce, "dice": dice, "thresh_l1": l1}
        return total, (metrics, new_state)

    def predict_maps(self, variables, images):
        return self.net.apply(variables, images, train=False)
