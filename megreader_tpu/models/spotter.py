"""RoI text spotter: shared trunk + deformable RoI pooling + CTC head.

The reference's DCN extension ships deformable RoI pooling alongside the
deformable convs (``assets/ops/dcn`` [U], SURVEY.md §2.6 N1); its research
lineage (Mask TextSpotter, from the same group) consumes it as the second
stage of end-to-end spotting: pool per-word features from a SHARED page
trunk instead of re-running a recognizer CNN on every pixel crop. This
module is that consumer, TPU-first:

  pages (B, H, W, 3)
    -> ResNet det trunk + FPN  -> fused (B, H/4, W/4, D)   [one trunk pass]
    -> DeformRoIPooling((kh, kw) bins, offsets learned per RoI)
       over each page's word boxes                 -> (B, P, kh, kw, D)
    -> height-mean -> BiLSTM -> Dense              -> (B, P, kw, classes)
    -> CTC loss over valid RoIs / greedy decode

Against the crop pipeline the trunk cost is amortized over all words on a
page, and the learned bin offsets let the pooling track rotated/perspective
text inside its axis-aligned box — the deformable pooling doing exactly the
job the reference built it for.

Static shapes: P RoI slots per page (padded, masked); rois are
axis-aligned (x0, y0, x1, y1) page-coordinate boxes.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import register
from ..ops.ctc import ctc_greedy_decode, ctc_loss
from ..ops.losses import balanced_bce_loss, dice_loss, masked_l1_loss
from .deform import DeformRoIPooling
from .detector import FPNNeck, MapHead
from .resnet import resnet_variant


class RoITextSpotterNet(nn.Module):
    num_classes: int
    backbone: str = "resnet18"
    fpn_dim: int = 256
    #: (kh, kw) RoI bin grid; kw is the CTC time axis (kw >= ~2x the
    #: longest expected word).
    pool_hw: Tuple[int, int] = (4, 32)
    hidden: int = 256
    trans_hidden: int = 128  # offset-head width inside DeformRoIPooling
    dcn_stages: Any = ()
    dtype: Any = None

    @nn.compact
    def __call__(self, images, rois, train: bool = False):
        """images (B, H, W, 3) normalized; rois (B, P, 4) as (x0, y0, x1, y1)
        page coords. Returns logits (B, P, kw, num_classes) fp32."""
        feats = resnet_variant(
            self.backbone, "det", dtype=self.dtype,
            dcn_stages=tuple(self.dcn_stages),
        )(images, train=train)
        fused = FPNNeck(self.fpn_dim, self.fpn_dim, dtype=self.dtype, name="fpn")(feats)
        # Deformable pooling runs per page over that page's RoI slots;
        # params are shared across the batch via nn.vmap.
        pool = nn.vmap(
            DeformRoIPooling,
            in_axes=(0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(
            out_size=tuple(self.pool_hw),
            spatial_scale=0.25,  # fused map is at stride 4
            hidden=self.trans_hidden,
            name="roi_pool",
        )
        pooled = pool(fused.astype(jnp.float32), rois)  # (B, P, kh, kw, D)
        B, P, kh, kw, D = pooled.shape
        seq = jnp.mean(pooled, axis=2)  # (B, P, kw, D)
        seq = seq.reshape(B * P, kw, D)
        if self.dtype is not None:
            seq = seq.astype(self.dtype)
        from .sequence import StackedBiLSTM

        seq = StackedBiLSTM(self.hidden, 1, dtype=self.dtype, name="encoder")(seq)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(seq)
        return logits.astype(jnp.float32).reshape(B, P, kw, self.num_classes)


@register
class RoITextSpotter:
    """Task wrapper: CTC loss over valid RoIs, greedy decode per region."""

    def __init__(
        self,
        num_classes: int = 37,
        backbone: str = "resnet18",
        fpn_dim: int = 256,
        pool_hw=(4, 32),
        hidden: int = 256,
        blank: int = 0,
        dcn_stages=(),
        compute_dtype: str = "float32",
    ):
        self.net = RoITextSpotterNet(
            num_classes=num_classes,
            backbone=backbone,
            fpn_dim=fpn_dim,
            pool_hw=tuple(pool_hw),
            hidden=hidden,
            dcn_stages=tuple(dcn_stages),
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        )
        self.num_classes = num_classes
        self.blank = blank

    def init(self, rng, sample_images, sample_rois=None):
        if sample_rois is None:
            B = sample_images.shape[0]
            sample_rois = jnp.tile(
                jnp.asarray([[0.0, 0.0, 64.0, 16.0]], jnp.float32), (B, 1, 1)
            )
        return self.net.init(rng, sample_images, sample_rois, train=False)

    def apply(self, variables, images, rois, train: bool = False, mutable=False):
        return self.net.apply(variables, images, rois, train=train, mutable=mutable)

    def loss(self, variables, batch, train: bool = True, rngs=None):
        """batch: image (B,H,W,3) normalized; rois (B,P,4); roi_valid (B,P)
        bool; label (B,P,L) int32; label_length (B,P) int32."""
        out = self.net.apply(
            variables,
            batch["image"],
            batch["rois"],
            train=train,
            mutable=["batch_stats"] if train else False,
            rngs=rngs,
        )
        logits, new_state = out if train else (out, {})
        B, P, T, _ = logits.shape
        flat = logits.reshape(B * P, T, self.num_classes)
        labels = batch["label"].reshape(B * P, -1)
        lab_len = batch["label_length"].reshape(B * P)
        valid = batch["roi_valid"].reshape(B * P) & (lab_len > 0)
        nll = ctc_loss(
            flat,
            jnp.full((B * P,), T, jnp.int32),
            labels,
            # invalid slots get a 1-length dummy target and are masked out
            jnp.where(valid, lab_len, 1),
            blank=self.blank,
            reduction="none",
        )
        per = nll / jnp.maximum(lab_len, 1).astype(nll.dtype)
        loss = jnp.sum(jnp.where(valid, per, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1
        ).astype(nll.dtype)
        metrics = {"loss": loss, "n_rois": jnp.sum(valid).astype(jnp.float32)}
        return loss, (metrics, new_state)

    def decode(self, variables, images, rois):
        """Greedy CTC per RoI: (ids (B, P, T), lengths (B, P))."""
        logits = self.net.apply(variables, images, rois, train=False)
        B, P, T, _ = logits.shape
        ids, lens = ctc_greedy_decode(
            logits.reshape(B * P, T, -1),
            jnp.full((B * P,), T, jnp.int32),
            blank=self.blank,
        )
        return ids.reshape(B, P, T), lens.reshape(B, P)


# ---------------------------------------------------------------------------
# Shared-trunk spotter: detection heads + RoI recognition from ONE trunk
# ---------------------------------------------------------------------------


class SharedTrunkSpotterNet(nn.Module):
    """One trunk+FPN serving BOTH tasks (the FOTS-style shared-conv layout,
    and the honest test of the amortized-trunk claim — VERDICT r3 #6):

      pages -> trunk -> FPN fused (B, H/4, W/4, D)
        -> prob/thresh MapHeads            (detection, DB losses)
        -> DeformRoIPooling over word RoIs -> BiLSTM -> CTC  (recognition)

    Serving never runs a second trunk: the e2e program detects on the fused
    map's prob head, derives boxes, and pools from the SAME fused map.
    ``rois=None`` skips the recognition branch (pure detection forward);
    ``heads=()`` skips detection (pure recognition over given rois).
    """

    num_classes: int
    backbone: str = "resnet18"
    fpn_dim: int = 256
    head_dim: int = 64
    k: float = 50.0
    pool_hw: Tuple[int, int] = (4, 32)
    hidden: int = 256
    trans_hidden: int = 128
    dcn_stages: Any = ()
    dtype: Any = None

    def setup(self):
        from .sequence import StackedBiLSTM

        self.trunk = resnet_variant(
            self.backbone, "det", dtype=self.dtype,
            dcn_stages=tuple(self.dcn_stages),
        )
        self.fpn = FPNNeck(self.fpn_dim, self.fpn_dim, dtype=self.dtype)
        self.prob_head = MapHead(self.head_dim, dtype=self.dtype)
        self.thresh_head = MapHead(self.head_dim, dtype=self.dtype)
        self.roi_pool = nn.vmap(
            DeformRoIPooling,
            in_axes=(0, 0), out_axes=0,
            variable_axes={"params": None}, split_rngs={"params": False},
        )(
            out_size=tuple(self.pool_hw), spatial_scale=0.25,
            hidden=self.trans_hidden,
        )
        self.encoder = StackedBiLSTM(self.hidden, 1, dtype=self.dtype)
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype)

    def fused_map(self, images, train: bool = False):
        """ONE trunk+FPN pass -> (B, H/4, W/4, D). Serving calls this once
        and feeds both branches below from the result."""
        return self.fpn(self.trunk(images, train=train))

    def detect_maps(self, fused, train: bool = False,
                    heads: Tuple[str, ...] = ("prob", "thresh")):
        out = {}
        if "prob" in heads:
            out["prob"] = self.prob_head(fused, train=train)
        if "thresh" in heads:
            out["thresh"] = self.thresh_head(fused, train=train)
        if "prob" in out and "thresh" in out:
            out["binary"] = jax.nn.sigmoid(
                self.k * (out["prob"] - out["thresh"])
            )
        return out

    def recognize(self, fused, rois):
        """(B, P, 4) page-coord boxes -> logits (B, P, kw, classes) fp32."""
        pooled = self.roi_pool(fused.astype(jnp.float32), rois)
        B, P, kh, kw, D = pooled.shape
        seq = jnp.mean(pooled, axis=2).reshape(B * P, kw, D)
        if self.dtype is not None:
            seq = seq.astype(self.dtype)
        seq = self.encoder(seq)
        logits = self.classifier(seq)
        return logits.astype(jnp.float32).reshape(B, P, kw, self.num_classes)

    def __call__(self, images, rois=None, train: bool = False,
                 heads: Tuple[str, ...] = ("prob", "thresh")):
        fused = self.fused_map(images, train=train)
        out = dict(self.detect_maps(fused, train=train, heads=heads))
        if rois is not None:
            out["logits"] = self.recognize(fused, rois)
        return out


@register
class SharedTrunkSpotter:
    """Task wrapper: joint DB detection losses + CTC recognition loss from
    one trunk pass; serving composes via pipelines/spotter_e2e.py."""

    def __init__(
        self,
        num_classes: int = 37,
        backbone: str = "resnet18",
        fpn_dim: int = 256,
        head_dim: int = 64,
        pool_hw=(4, 32),
        hidden: int = 256,
        blank: int = 0,
        dcn_stages=(),
        compute_dtype: str = "float32",
        bce_scale: float = 5.0,
        l1_scale: float = 10.0,
        negative_ratio: float = 3.0,
        ctc_scale: float = 1.0,
    ):
        self.net = SharedTrunkSpotterNet(
            num_classes=num_classes,
            backbone=backbone,
            fpn_dim=fpn_dim,
            head_dim=head_dim,
            pool_hw=tuple(pool_hw),
            hidden=hidden,
            dcn_stages=tuple(dcn_stages),
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        )
        self.num_classes = num_classes
        self.blank = blank
        self.bce_scale = bce_scale
        self.l1_scale = l1_scale
        self.negative_ratio = negative_ratio
        self.ctc_scale = ctc_scale

    def init(self, rng, sample_images, sample_rois=None):
        if sample_rois is None:
            B = sample_images.shape[0]
            sample_rois = jnp.tile(
                jnp.asarray([[0.0, 0.0, 64.0, 16.0]], jnp.float32), (B, 1, 1)
            )
        return self.net.init(rng, sample_images, sample_rois, train=False)

    def apply(self, variables, images, rois=None, train: bool = False,
              mutable=False, heads=("prob", "thresh")):
        return self.net.apply(
            variables, images, rois, train=train, mutable=mutable,
            heads=tuple(heads),
        )

    def loss(self, variables, batch, train: bool = True, rngs=None):
        """batch: image; gt/mask/thresh_map/thresh_mask det targets;
        rois (B,P,4); roi_valid (B,P); label (B,P,L); label_length (B,P)."""
        out = self.net.apply(
            variables, batch["image"], batch["rois"], train=train,
            mutable=["batch_stats"] if train else False, rngs=rngs,
        )
        maps, new_state = out if train else (out, {})
        bce = balanced_bce_loss(
            maps["prob"], batch["gt"], batch["mask"], self.negative_ratio
        )
        dice = dice_loss(maps["binary"], batch["gt"], batch["mask"])
        l1 = masked_l1_loss(
            maps["thresh"], batch["thresh_map"], batch["thresh_mask"]
        )

        logits = maps["logits"]
        B, P, T, _ = logits.shape
        flat = logits.reshape(B * P, T, self.num_classes)
        labels = batch["label"].reshape(B * P, -1)
        lab_len = batch["label_length"].reshape(B * P)
        valid = batch["roi_valid"].reshape(B * P) & (lab_len > 0)
        nll = ctc_loss(
            flat, jnp.full((B * P,), T, jnp.int32), labels,
            jnp.where(valid, lab_len, 1), blank=self.blank, reduction="none",
        )
        per = nll / jnp.maximum(lab_len, 1).astype(nll.dtype)
        ctc = jnp.sum(jnp.where(valid, per, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1
        ).astype(nll.dtype)

        total = self.bce_scale * bce + dice + self.l1_scale * l1 + self.ctc_scale * ctc
        metrics = {"loss": total, "bce": bce, "dice": dice,
                   "thresh_l1": l1, "ctc": ctc}
        return total, (metrics, new_state)

    def decode(self, variables, images, rois):
        """Greedy CTC per RoI (recognition branch only — no det heads)."""
        out = self.net.apply(variables, images, rois, train=False, heads=())
        logits = out["logits"]
        B, P, T, _ = logits.shape
        ids, lens = ctc_greedy_decode(
            logits.reshape(B * P, T, -1),
            jnp.full((B * P,), T, jnp.int32),
            blank=self.blank,
        )
        return ids.reshape(B, P, T), lens.reshape(B, P)
