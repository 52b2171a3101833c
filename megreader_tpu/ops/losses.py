"""Segmentation losses: balanced BCE, dice, masked L1.

Rebuilds the reference's ``decoders/balance_cross_entropy_loss.py`` /
``dice_loss.py`` [U] (SURVEY.md §2.4) with one TPU-critical change: the
reference's hard negative mining sorts negative losses and takes the top-k
with k = ratio * #positives — data-dependent k. We keep exact top-k
semantics but compute it with a static-shape threshold trick: the k-th
largest negative loss is found via ``jax.lax.top_k`` over the flattened map
(static size), then negatives >= that threshold are kept by mask. No
dynamic shapes anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6


def balanced_bce_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    negative_ratio: float = 3.0,
) -> jnp.ndarray:
    """Hard-negative-mined BCE over probability maps.

    pred: (B, H, W) sigmoid probabilities; gt: {0,1}; mask: valid pixels.
    Keeps all positives and the hardest ``negative_ratio * #pos`` negatives.
    """
    pred = jnp.clip(pred, EPS, 1.0 - EPS)
    bce = -(gt * jnp.log(pred) + (1.0 - gt) * jnp.log(1.0 - pred))  # (B,H,W)

    pos = gt * mask
    neg = (1.0 - gt) * mask
    B = pred.shape[0]
    bce_f = bce.reshape(B, -1)
    pos_f = pos.reshape(B, -1)
    neg_f = neg.reshape(B, -1)
    N = bce_f.shape[1]

    n_pos = jnp.sum(pos_f, axis=1)  # (B,)
    n_neg_keep = jnp.minimum(
        jnp.maximum(n_pos * negative_ratio, 1.0), jnp.sum(neg_f, axis=1)
    )  # (B,)

    neg_losses = jnp.where(neg_f > 0, bce_f, -jnp.inf)
    sorted_neg = -jnp.sort(-neg_losses, axis=1)  # descending
    k_idx = jnp.clip(n_neg_keep.astype(jnp.int32) - 1, 0, N - 1)
    kth = jnp.take_along_axis(sorted_neg, k_idx[:, None], axis=1)  # (B,1)
    neg_keep = (neg_losses >= kth) & (neg_f > 0)

    pos_sum = jnp.sum(bce_f * pos_f, axis=1)
    neg_sum = jnp.sum(jnp.where(neg_keep, bce_f, 0.0), axis=1)
    denom = n_pos + jnp.sum(neg_keep, axis=1) + EPS
    return jnp.mean((pos_sum + neg_sum) / denom)


def dice_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """1 - 2|X∩Y| / (|X|+|Y|), over masked pixels (the binary-map loss)."""
    inter = jnp.sum(pred * gt * mask)
    union = jnp.sum(pred * pred * mask) + jnp.sum(gt * gt * mask) + EPS
    return 1.0 - 2.0 * inter / union


def masked_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred - gt| over mask support (threshold-map regression)."""
    s = jnp.sum(mask)
    return jnp.sum(jnp.abs(pred - gt) * mask) / (s + EPS)
