"""2-D attentional recognizer with greedy + beam-search decoding
(judged config #3; reference: decoders/attention_decoder [U], SURVEY.md §2.4).

Architecture (TPU-first, all static shapes):
  backbone ('rec2d', keeps the 2-D grid) -> (B, H', W', C)
  + learned 2-D positional embedding -> memory (B, H'*W', D)
  decoder: GRU cell; additive (Bahdanau) attention over the 2-D memory;
  input = [embedding(y_{t-1}), context]; logits from [state, context].

Training: teacher forcing — one `lax.scan` over the GO-shifted target
sequence; masked cross-entropy (mask includes the EOS position).

Inference:
  greedy — scan with argmax feedback, frozen after EOS.
  beam   — fixed-width batched beam search: states (B, W, ...) expand to
  W*V candidates per step, top-k keeps W; finished beams (EOS emitted)
  propagate with frozen score. Length-normalized final ranking.

Charset convention: AttentionCharset (PAD=0, GO=1, EOS=2, chars from 3).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.charset import AttentionCharset
from ..core.registry import register
from .resnet import resnet_variant

NEG_INF = -1e30


class GRUCellTorchlike(nn.Module):
    """GRU cell with torch gate order (r, z, n) for checkpoint parity."""

    hidden: int

    @nn.compact
    def __call__(self, x, h):
        H = self.hidden
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (3 * H, x.shape[-1]))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (3 * H, H))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * H,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * H,))
        gi = x @ w_ih.T + b_ih
        gh = h @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


class AttentionRecognizerNet(nn.Module):
    """Encoder + one-step decoder; scans live in the task wrapper."""

    num_classes: int
    backbone: str = "resnet18"
    dim: int = 256
    max_len: int = 32
    width: int = 64  # trunk base width
    dtype: Any = None  # bf16 trunk (decoder/attention stay fp32)

    def setup(self):
        self.trunk = resnet_variant(
            self.backbone, "rec2d", width=self.width, dtype=self.dtype
        )
        self.mem_proj = nn.Dense(self.dim, name="mem_proj")
        self.embed = nn.Embed(self.num_classes, self.dim, name="embed")
        self.cell = GRUCellTorchlike(self.dim, name="gru")
        self.attn_mem = nn.Dense(self.dim, use_bias=False, name="attn_mem")
        self.attn_state = nn.Dense(self.dim, use_bias=False, name="attn_state")
        self.attn_v = nn.Dense(1, use_bias=False, name="attn_v")
        self.out = nn.Dense(self.num_classes, name="out")

    @nn.compact
    def encode(self, images, train: bool = False):
        feat = self.trunk(images, train=train).astype(jnp.float32)  # (B,H,W,C)
        B, H, W, C = feat.shape
        mem = self.mem_proj(feat)  # (B, H, W, D)
        pos = self.param(
            "pos2d", nn.initializers.normal(0.02), (1, H, W, self.dim)
        )
        mem = (mem + pos).reshape(B, H * W, self.dim)
        return mem, self.attn_mem(mem)  # memory, precomputed keys

    def attend(self, keys, mem, state):
        # additive attention: (B, N, D) keys vs (B, D) state
        score = self.attn_v(jnp.tanh(keys + self.attn_state(state)[:, None, :]))[..., 0]
        w = jax.nn.softmax(score, axis=1)  # (B, N)
        ctx = jnp.einsum("bn,bnd->bd", w, mem)
        return ctx, w

    def decode_step(self, keys, mem, state, y_prev):
        """One decoder step: (state, y_prev) -> (new_state, logits)."""
        ctx, _ = self.attend(keys, mem, state)
        x = jnp.concatenate([self.embed(y_prev), ctx], axis=-1)
        new_state = self.cell(x, state)
        logits = self.out(jnp.concatenate([new_state, ctx], axis=-1))
        return new_state, logits

    def __call__(self, images, targets_in, train: bool = False):
        """Teacher-forced forward: targets_in (B, T) starts with GO.

        Returns logits (B, T, num_classes).
        """
        mem, keys = self.encode(images, train=train)
        B = images.shape[0]
        state0 = jnp.zeros((B, self.dim), mem.dtype)

        # nn.scan (not raw lax.scan): decoder params are flax variables and
        # must be broadcast into the loop, not created inside its trace.
        def body(mdl, state, y_t):
            new_state, logits = mdl.decode_step(keys, mem, state, y_t)
            return new_state, logits

        scan = nn.scan(
            body,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False, "dropout": False},
            in_axes=1,
            out_axes=1,
        )
        _, logits = scan(self, state0, targets_in)
        return logits  # (B, T, V)


@register
class AttentionRecognizer:
    """Task wrapper: teacher-forced loss, greedy + beam decode."""

    def __init__(
        self,
        num_classes: int = 39,  # AttentionCharset: 36 chars + PAD/GO/EOS
        backbone: str = "resnet18",
        dim: int = 256,
        max_len: int = 32,
        width: int = 64,
        compute_dtype: str = "float32",
    ):
        self.net = AttentionRecognizerNet(
            num_classes=num_classes, backbone=backbone, dim=dim, max_len=max_len,
            width=width,
            dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        )
        self.num_classes = num_classes
        self.max_len = max_len

    def init(self, rng, sample_images):
        B = sample_images.shape[0]
        tgt = jnp.zeros((B, self.max_len), jnp.int32)
        return self.net.init(rng, sample_images, tgt, train=False)

    def loss(self, variables, batch, train: bool = True, rngs=None):
        """batch: {image, label (B,T) EOS-terminated PAD-padded, label_length}."""
        labels = batch["label"]
        B, T = labels.shape
        go = jnp.full((B, 1), AttentionCharset.GO, jnp.int32)
        targets_in = jnp.concatenate([go, labels[:, : T - 1]], axis=1)
        out = self.net.apply(
            variables,
            batch["image"],
            targets_in,
            train=train,
            mutable=["batch_stats"] if train else False,
            rngs=rngs,
        )
        logits, new_state = out if train else (out, {})
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_ll = jnp.take_along_axis(logp, labels[:, :, None], axis=2)[..., 0]
        mask = (jnp.arange(T)[None, :] < batch["label_length"][:, None]).astype(logp.dtype)
        loss = -jnp.sum(tok_ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, ({"loss": loss}, new_state)

    def _encode(self, variables, images):
        return self.net.apply(variables, images, train=False, method=self.net.encode)

    def decode_greedy(self, variables, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mem, keys = self._encode(variables, images)
        B = images.shape[0]
        state0 = jnp.zeros((B, self.net.dim), mem.dtype)
        y0 = jnp.full((B,), AttentionCharset.GO, jnp.int32)
        done0 = jnp.zeros((B,), bool)

        def step(carry, _):
            state, y, done = carry
            new_state, logits = self.net.apply(
                variables, keys, mem, state, y, method=self.net.decode_step
            )
            y_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            y_next = jnp.where(done, AttentionCharset.PAD, y_next)
            new_done = done | (y_next == AttentionCharset.EOS)
            state = jnp.where(done[:, None], state, new_state)
            return (state, y_next, new_done), y_next

        _, ys = jax.lax.scan(step, (state0, y0, done0), None, length=self.max_len)
        ids = jnp.swapaxes(ys, 0, 1)  # (B, T)
        # length = position of first EOS + 1 (or max_len)
        is_eos = ids == AttentionCharset.EOS
        any_eos = jnp.any(is_eos, axis=1)
        first_eos = jnp.argmax(is_eos, axis=1)
        lengths = jnp.where(any_eos, first_eos + 1, self.max_len).astype(jnp.int32)
        return ids, lengths

    def decode_beam(
        self, variables, images, beam_width: int = 5, length_penalty: float = 0.0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched fixed-width beam search; returns best sequences."""
        mem, keys = self._encode(variables, images)
        B, N, D = mem.shape
        W, V, T = beam_width, self.num_classes, self.max_len

        # Tile memory per beam: (B*W, N, D)
        mem_t = jnp.repeat(mem, W, axis=0)
        keys_t = jnp.repeat(keys, W, axis=0)

        state = jnp.zeros((B * W, D), mem.dtype)
        y = jnp.full((B * W,), AttentionCharset.GO, jnp.int32)
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((W - 1,), NEG_INF)])[None], (B, 1)
        )  # (B, W): only beam 0 live initially
        done = jnp.zeros((B, W), bool)
        seqs = jnp.zeros((B, W, T), jnp.int32)

        def step(carry, t):
            state, y, scores, done, seqs = carry
            new_state, logits = self.net.apply(
                variables, keys_t, mem_t, state, y, method=self.net.decode_step
            )
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, W, V)
            # Finished beams: only allow PAD continuation at zero cost.
            pad_only = jnp.full((V,), NEG_INF).at[AttentionCharset.PAD].set(0.0)
            logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)
            cand = scores[:, :, None] + logp  # (B, W, V)
            flat = cand.reshape(B, W * V)
            top_scores, top_idx = jax.lax.top_k(flat, W)  # (B, W)
            src_beam = top_idx // V
            tok = (top_idx % V).astype(jnp.int32)

            # Gather beam state
            batch_idx = jnp.arange(B)[:, None]
            flat_src = (batch_idx * W + src_beam).reshape(-1)
            state_new = jnp.where(
                done.reshape(-1)[flat_src][:, None],
                state[flat_src],
                new_state.reshape(B * W, D)[flat_src],
            )
            seqs_new = seqs[batch_idx, src_beam]  # (B, W, T)
            seqs_new = seqs_new.at[:, :, t].set(tok)
            done_new = done[batch_idx, src_beam] | (tok == AttentionCharset.EOS)
            return (state_new, tok.reshape(-1), top_scores, done_new, seqs_new), None

        carry, _ = jax.lax.scan(
            step, (state, y, scores, done, seqs), jnp.arange(T)
        )
        _, _, scores, done, seqs = carry

        is_eos = seqs == AttentionCharset.EOS
        any_eos = jnp.any(is_eos, axis=2)
        first_eos = jnp.argmax(is_eos, axis=2)
        lengths = jnp.where(any_eos, first_eos + 1, T)  # (B, W)
        if length_penalty > 0:
            norm = ((5.0 + lengths.astype(scores.dtype)) / 6.0) ** length_penalty
            ranked = scores / norm
        else:
            ranked = scores
        best = jnp.argmax(ranked, axis=1)  # (B,)
        ids = jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
        out_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0].astype(jnp.int32)
        return ids, out_len
