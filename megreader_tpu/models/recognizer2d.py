"""2D-CTC recognizer (judged config #2): CNN -> 2-D prob map + height head.

Rebuilds the reference's 2D-CTC module (SURVEY.md §2.4, §3.5): the backbone
keeps vertical resolution ('rec2d' variant, H'=4 for 32-high crops — raise
via a taller input for strongly curved text), a 1×1 conv head produces the
class log-probs per (column, height) cell, and a height head produces either
a per-column distribution ('independent') or a per-column transition matrix
('markov').

Shape trace (B, 32, 100, 3):
  resnet18-rec2d -> (B, 4, 25, 512)
  class head     -> (B, 25, 4, num_classes) log-softmax over classes
  height head    -> independent: (B, 25, 4); markov: (B, 25, 4, 4) + init
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import register
from ..ops.ctc2d import (
    ctc2d_greedy_decode,
    ctc2d_loss_independent,
    ctc2d_loss_markov,
    ctc2d_viterbi_height_decode,
)
from .resnet import resnet_variant


class Ctc2dRecognizerNet(nn.Module):
    num_classes: int
    backbone: str = "resnet18"
    transition: str = "independent"  # 'independent' | 'markov'
    width: int = 64  # trunk base width (narrow trunks for parity tests)
    dtype: Any = None  # bf16 trunk for mixed-precision training; heads fp32

    @nn.compact
    def __call__(self, images, train: bool = False):
        feat = resnet_variant(
            self.backbone, "rec2d", width=self.width, dtype=self.dtype
        )(images, train=train)  # (B,H,W,C)
        feat = jnp.transpose(feat, (0, 2, 1, 3)).astype(jnp.float32)  # (B,W=T,H,C)
        B, T, H, C = feat.shape

        emit = nn.Dense(self.num_classes, name="class_head")(feat)
        emit_log_probs = jax.nn.log_softmax(emit, axis=-1)  # (B,T,H,nc)

        if self.transition == "independent":
            hscore = nn.Dense(1, name="height_head")(feat)[..., 0]  # (B,T,H)
            height_log_probs = jax.nn.log_softmax(hscore, axis=-1)
            return emit_log_probs, height_log_probs
        elif self.transition == "markov":
            tscore = nn.Dense(H, name="trans_head")(feat)  # (B,T,Hnew per Hprev?) -> (B,T,H,H)
            trans_log_probs = jax.nn.log_softmax(tscore, axis=-1)  # rows=h_prev
            iscore = nn.Dense(1, name="init_head")(feat[:, 0])[..., 0]  # (B,H)
            init_log_probs = jax.nn.log_softmax(iscore, axis=-1)
            return emit_log_probs, trans_log_probs, init_log_probs
        raise ValueError(f"unknown transition {self.transition!r}")


@register
class Ctc2dRecognizer:
    """Task wrapper for the 2D-CTC recognizer."""

    def __init__(
        self,
        num_classes: int = 37,
        backbone: str = "resnet18",
        transition: str = "independent",
        blank: int = 0,
        loss_impl: str = "auto",  # 'auto' | 'xla' | 'pallas'
        width: int = 64,
        compute_dtype: str = "float32",
    ):
        self.net = Ctc2dRecognizerNet(
            num_classes=num_classes, backbone=backbone, transition=transition,
            width=width,
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        )
        self.transition = transition
        self.blank = blank
        if loss_impl == "auto":
            import jax

            loss_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.loss_impl = loss_impl

    def init(self, rng, sample_images):
        return self.net.init(rng, sample_images, train=False)

    def apply(self, variables, images, train: bool = False, mutable=False):
        return self.net.apply(variables, images, train=train, mutable=mutable)

    def loss(self, variables, batch, train: bool = True, rngs=None):
        out = self.net.apply(
            variables,
            batch["image"],
            train=train,
            mutable=["batch_stats"] if train else False,
            rngs=rngs,
        )
        heads, new_state = out if train else (out, {})
        B = batch["image"].shape[0]
        if self.transition == "independent":
            emit, height = heads
            T = emit.shape[1]
            lengths = jnp.full((B,), T, dtype=jnp.int32)
            if self.loss_impl == "pallas":
                # Heights marginalize per column (ops/ctc2d.fuse_heights), so
                # the independent formulation rides the Pallas 1-D CTC kernel.
                from ..ops.ctc2d import fuse_heights
                from ..ops.pallas_ctc import _ctc_nll_pallas

                fused = fuse_heights(emit, height)
                nll = _ctc_nll_pallas(
                    fused, lengths, batch["label"], batch["label_length"],
                    self.blank, False,
                )
                denom = jnp.maximum(batch["label_length"], 1).astype(nll.dtype)
                loss = jnp.mean(nll / denom)
            else:
                loss = ctc2d_loss_independent(
                    emit, height, lengths, batch["label"], batch["label_length"],
                    blank=self.blank,
                )
        else:
            emit, trans, init = heads
            T = emit.shape[1]
            lengths = jnp.full((B,), T, dtype=jnp.int32)
            if self.loss_impl == "pallas":
                from ..ops.pallas_ctc2d import ctc2d_loss_markov_pallas

                loss = ctc2d_loss_markov_pallas(
                    emit, trans, init, lengths, batch["label"], batch["label_length"],
                    blank=self.blank,
                )
            else:
                loss = ctc2d_loss_markov(
                    emit, trans, init, lengths, batch["label"], batch["label_length"],
                    blank=self.blank,
                )
        return loss, ({"loss": loss}, new_state)

    def decode(
        self, variables, images, mode: str = "greedy", beam_width: int = 8,
        blank_collapse: float = 1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        heads = self.net.apply(variables, images, train=False)
        # decode DP/beam math in f32 regardless of serving dtype
        heads = tuple(h.astype(jnp.float32) for h in heads)
        B = images.shape[0]
        if self.transition == "independent":
            emit, height = heads
            lengths = jnp.full((B,), emit.shape[1], dtype=jnp.int32)
            if mode == "beam":
                # Heights marginalize per column; beam-search the fused
                # 1-D posterior (paper's beam variant, SURVEY.md §2.4).
                from ..ops.ctc import ctc_beam_decode
                from ..ops.ctc2d import fuse_heights

                fused = fuse_heights(emit, height)
                return ctc_beam_decode(
                    fused, lengths, beam_width=beam_width, blank=self.blank,
                    blank_collapse=blank_collapse,
                )
            return ctc2d_greedy_decode(emit, height, lengths, blank=self.blank)
        emit, trans, init = heads
        lengths = jnp.full((B,), emit.shape[1], dtype=jnp.int32)
        return ctc2d_viterbi_height_decode(emit, trans, init, lengths, blank=self.blank)
