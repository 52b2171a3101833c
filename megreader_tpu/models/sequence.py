"""Sequence encoders: scan-based (Bi)LSTM and a transformer encoder.

The reference uses cuDNN ``nn.LSTM`` (SURVEY.md §2.6 N4); the TPU-native
equivalent is a ``jax.lax.scan`` recurrence — XLA compiles the per-step
matmuls onto the MXU and pipelines the scan. Gate order and parameter
shapes deliberately follow torch's LSTM convention
(W_ih: (4H, in) with gates [i, f, g, o]) so ``compat.torch_convert`` is a
pure reshape/transpose — parity-critical.

The transformer encoder is the modern alternative the north star allows
("BiLSTM/transformer sequence encoders", BASELINE.json) — pre-LN MHA blocks
over the width axis, all static shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTM(nn.Module):
    """Unidirectional LSTM over (B, T, D), torch gate conventions.

    reverse=True processes the sequence back-to-front (still returning
    outputs in forward order), for the backward half of a BiLSTM.
    """

    hidden: int
    reverse: bool = False
    #: matmul compute dtype (bf16 for mixed precision; params stay fp32,
    #: gate nonlinearities and the cell state run in fp32).
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.hidden
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (4 * H, D))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (4 * H, H))
        b_ih = self.param("b_ih", nn.initializers.zeros, (4 * H,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (4 * H,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w_ih = w_ih.astype(self.dtype)
            w_hh = w_hh.astype(self.dtype)
        # Accumulator dtype: mixed-precision TRAINING (dtype set, fp32
        # params) keeps gates/cell state fp32 for stable recurrence; with
        # dtype unset the cell follows the inputs — so a fully bf16-cast
        # serving tree runs the whole scan in bf16 (the fp32-forced variant
        # cost ~20% crop throughput).
        acc = jnp.float32 if self.dtype is not None else x.dtype

        # Precompute input projections for every step in one big matmul
        # (MXU-friendly: (B*T, D) @ (D, 4H)), leaving only the small
        # recurrent matmul inside the scan.
        x_proj = ((x @ w_ih.T) + b_ih + b_hh).astype(acc)  # (B, T, 4H)
        if self.reverse:
            x_proj = jnp.flip(x_proj, axis=1)

        def step(carry, xp):
            h, c = carry
            hh = (h.astype(w_hh.dtype) @ w_hh.T).astype(acc)
            gates = xp + hh  # (B, 4H)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, H), acc)
        (_, _), ys = jax.lax.scan(step, (h0, h0), jnp.swapaxes(x_proj, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class BiLSTM(nn.Module):
    """Bidirectional LSTM: concat of forward and backward passes (B, T, 2H)."""

    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fwd = LSTM(self.hidden, reverse=False, dtype=self.dtype, name="fwd")(x)
        bwd = LSTM(self.hidden, reverse=True, dtype=self.dtype, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class StackedBiLSTM(nn.Module):
    """N stacked BiLSTM layers (the reference's typical 2-layer encoder)."""

    hidden: int
    num_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = BiLSTM(self.hidden, dtype=self.dtype, name=f"layer{i}")(x)
        return x


class TransformerEncoder(nn.Module):
    """Pre-LN transformer encoder over the sequence (width) axis."""

    dim: int = 256
    num_layers: int = 2
    num_heads: int = 8
    mlp_ratio: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, D = x.shape
        if D != self.dim:
            x = nn.Dense(self.dim, name="in_proj")(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, T, self.dim)
        )
        x = x + pos
        for i in range(self.num_layers):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dropout_rate=self.dropout,
                deterministic=not train,
                name=f"attn_{i}",
            )(y, y)
            x = x + y
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.Dense(self.dim * self.mlp_ratio, name=f"mlp1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, name=f"mlp2_{i}")(y)
            x = x + y
        return nn.LayerNorm(name="ln_out")(x)
