"""Pallas 2D-CTC kernels vs the XLA DP (itself brute-force-verified)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.ops.ctc2d import ctc2d_loss_markov
from megreader_tpu.ops.pallas_ctc2d import ctc2d_loss_markov_pallas


def _case(seed, B=5, T=10, H=4, C=6, Lmax=3):
    rng = np.random.default_rng(seed)
    emit = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, H, C)), jnp.float32), axis=-1
    )
    trans = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, H, H)), jnp.float32), axis=-1
    )
    init = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, H)), jnp.float32), axis=-1
    )
    logit_lengths = jnp.asarray(rng.integers(Lmax * 2 + 1, T + 1, (B,)), jnp.int32)
    label_lengths = jnp.asarray(rng.integers(1, Lmax + 1, (B,)), jnp.int32)
    labels = np.zeros((B, Lmax), np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(1, C, (int(label_lengths[b]),))
    return emit, trans, init, logit_lengths, jnp.asarray(labels), label_lengths


@pytest.mark.parametrize("seed", [0, 1])
def test_loss_matches_xla(seed):
    emit, trans, init, ll, lb, lbl = _case(seed)
    ref = ctc2d_loss_markov(emit, trans, init, ll, lb, lbl, reduction="none")
    got = ctc2d_loss_markov_pallas(
        emit, trans, init, ll, lb, lbl, reduction="none", interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_grads_match_xla():
    emit, trans, init, ll, lb, lbl = _case(2, B=3, T=8, H=3, C=5, Lmax=2)

    def ref_loss(e, t, i):
        return ctc2d_loss_markov(e, t, i, ll, lb, lbl, reduction="sum")

    def pal_loss(e, t, i):
        return ctc2d_loss_markov_pallas(
            e, t, i, ll, lb, lbl, reduction="sum", interpret=True
        )

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(emit, trans, init)
    g_pal = jax.grad(pal_loss, argnums=(0, 1, 2))(emit, trans, init)
    for a, b, name in zip(g_ref, g_pal, ["emit", "trans", "init"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4, err_msg=name
        )
