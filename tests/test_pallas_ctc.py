"""Pallas CTC kernels vs the XLA DP (itself torch-verified) — interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.ops.ctc import ctc_loss
from megreader_tpu.ops.pallas_ctc import ctc_loss_pallas


def _case(seed, B=5, T=12, C=7, Lmax=4):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 2.0
    logit_lengths = rng.integers(Lmax * 2 + 1, T + 1, size=(B,)).astype(np.int32)
    label_lengths = rng.integers(1, Lmax + 1, size=(B,)).astype(np.int32)
    labels = np.zeros((B, Lmax), dtype=np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(1, C, size=(label_lengths[b],))
    return (
        jnp.asarray(logits),
        jnp.asarray(logit_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_ctc_loss_matches_xla(seed):
    logits, ll, lb, lbl = _case(seed)
    ref = ctc_loss(logits, ll, lb, lbl, reduction="none")
    got = ctc_loss_pallas(logits, ll, lb, lbl, reduction="none", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_ctc_grad_matches_xla():
    logits, ll, lb, lbl = _case(3, B=4, T=10, C=6, Lmax=3)

    g_ref = jax.grad(lambda x: ctc_loss(x, ll, lb, lbl, reduction="sum"))(logits)
    g_pal = jax.grad(
        lambda x: ctc_loss_pallas(x, ll, lb, lbl, reduction="sum", interpret=True)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_pallas_ctc_handles_batch_padding():
    # B=3 not a multiple of the 8-row tile: padding lanes must not leak.
    logits, ll, lb, lbl = _case(4, B=3, T=9, C=5, Lmax=3)
    ref = ctc_loss(logits, ll, lb, lbl, reduction="none")
    got = ctc_loss_pallas(logits, ll, lb, lbl, reduction="none", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
