"""CTC loss/decode unit tests vs torch.nn.CTCLoss and optax oracles.

SURVEY.md §4: kernel-level tests against trusted references on random small
cases — the reference repo had no tests; the parity bar here is bit-level
agreement of the math, not just "trains fine".
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.ops.ctc import (
    ctc_alpha_scan,
    ctc_beam_decode,
    ctc_greedy_decode,
    ctc_loss,
)


def _random_case(rng, B=4, T=12, C=7, Lmax=5):
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 2.0
    logit_lengths = rng.integers(Lmax * 2 + 1, T + 1, size=(B,)).astype(np.int32)
    label_lengths = rng.integers(1, Lmax + 1, size=(B,)).astype(np.int32)
    labels = np.zeros((B, Lmax), dtype=np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(1, C, size=(label_lengths[b],))
    return logits, logit_lengths, labels, label_lengths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch(seed):
    import torch

    rng = np.random.default_rng(seed)
    logits, logit_lengths, labels, label_lengths = _random_case(rng)

    nll = ctc_loss(
        jnp.asarray(logits),
        jnp.asarray(logit_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
        reduction="none",
    )

    t_logits = torch.tensor(logits, requires_grad=True)
    t_logp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)  # (T, B, C)
    t_nll = torch.nn.functional.ctc_loss(
        t_logp,
        torch.tensor(labels),
        torch.tensor(logit_lengths),
        torch.tensor(label_lengths),
        blank=0,
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(nll), t_nll.detach().numpy(), rtol=2e-4, atol=2e-4)


def test_ctc_grad_matches_torch():
    import torch

    rng = np.random.default_rng(3)
    logits, logit_lengths, labels, label_lengths = _random_case(rng, B=3, T=10, C=6, Lmax=4)

    def loss_fn(x):
        return ctc_loss(
            x,
            jnp.asarray(logit_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
            reduction="sum",
        )

    g = jax.grad(loss_fn)(jnp.asarray(logits))

    t_logits = torch.tensor(logits, requires_grad=True)
    t_logp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    t_loss = torch.nn.functional.ctc_loss(
        t_logp,
        torch.tensor(labels),
        torch.tensor(logit_lengths),
        torch.tensor(label_lengths),
        blank=0,
        reduction="sum",
    )
    t_loss.backward()
    np.testing.assert_allclose(
        np.asarray(g), t_logits.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_ctc_loss_matches_optax():
    import optax

    rng = np.random.default_rng(4)
    logits, logit_lengths, labels, label_lengths = _random_case(rng, B=5, T=16, C=9, Lmax=6)
    nll = ctc_loss(
        jnp.asarray(logits),
        jnp.asarray(logit_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
        reduction="none",
    )
    T = logits.shape[1]
    Lmax = labels.shape[1]
    logit_pad = (np.arange(T)[None] >= logit_lengths[:, None]).astype(np.float32)
    label_pad = (np.arange(Lmax)[None] >= label_lengths[:, None]).astype(np.float32)
    ref = optax.ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_pad), jnp.asarray(labels), jnp.asarray(label_pad)
    )
    # optax accumulates in a different order; fp32 drift only.
    np.testing.assert_allclose(np.asarray(nll), np.asarray(ref), rtol=2e-3, atol=5e-2)


def test_greedy_decode_simple():
    # Hand-built: argmax path = [1,1,0,2,2,0,0,3] -> collapse -> [1,2,3]
    path = [1, 1, 0, 2, 2, 0, 0, 3]
    C = 5
    logits = np.full((1, len(path), C), -5.0, dtype=np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 5.0
    ids, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([len(path)]))
    assert int(lens[0]) == 3
    assert list(np.asarray(ids[0][:3])) == [1, 2, 3]


def test_greedy_decode_respects_length():
    path = [1, 0, 2, 3]  # but length=3 cuts the trailing 3
    C = 5
    logits = np.full((1, len(path), C), -5.0, dtype=np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 5.0
    ids, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([3]))
    assert int(lens[0]) == 2
    assert list(np.asarray(ids[0][:2])) == [1, 2]


def test_beam_matches_greedy_on_peaked_logits():
    # With near-one-hot distributions the best beam == greedy path.
    rng = np.random.default_rng(5)
    B, T, C = 3, 9, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 8.0
    lengths = jnp.asarray([T, T - 2, T - 4])
    gi, gl = ctc_greedy_decode(jnp.asarray(logits), lengths)
    bi, bl = ctc_beam_decode(jnp.asarray(logits), lengths, beam_width=4)
    for b in range(B):
        assert int(gl[b]) == int(bl[b])
        assert list(np.asarray(gi[b][: int(gl[b])])) == list(np.asarray(bi[b][: int(bl[b])]))


def test_beam_beats_or_matches_greedy_likelihood():
    # Beam search's chosen sequence should have total CTC probability >= greedy's.
    rng = np.random.default_rng(6)
    B, T, C = 4, 10, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)  # flat => ambiguous
    lengths = jnp.full((B,), T, dtype=jnp.int32)

    def seq_nll(ids, n):
        ids = ids[None, :]
        n = jnp.asarray([n], dtype=jnp.int32)
        lp = jax.nn.log_softmax(jnp.asarray(logits[b : b + 1]), axis=-1)
        nll, _ = ctc_alpha_scan(lp, lengths[b : b + 1], ids, n)
        return float(nll[0])

    gi, gl = ctc_greedy_decode(jnp.asarray(logits), lengths)
    bi, bl = ctc_beam_decode(jnp.asarray(logits), lengths, beam_width=8)
    for b in range(B):
        if int(bl[b]) == 0 or int(gl[b]) == 0:
            continue
        nll_beam = seq_nll(jnp.asarray(bi[b]), int(bl[b]))
        nll_greedy = seq_nll(jnp.asarray(gi[b]), int(gl[b]))
        assert nll_beam <= nll_greedy + 1e-3


def test_blank_collapse_frames_compaction():
    from megreader_tpu.ops.ctc import blank_collapse_frames

    B, T, C = 2, 6, 4
    lp = np.full((B, T, C), np.log(0.05 / 3), np.float32)
    # blank-dominated runs: frames 1-3 for b=0; frames 2-3 for b=1. Runs
    # fold into the NEXT kept frame's pre_blank scalar (summed blank lp).
    blank_dom = {0: [1, 2, 3], 1: [2, 3]}
    for b in range(B):
        for t in range(T):
            if t in blank_dom[b]:
                lp[b, t, 0] = np.log(0.9995)
            else:
                lp[b, t, 0] = np.log(0.05)
                lp[b, t, 1 + (t % 3)] = np.log(0.85)
    lengths = jnp.asarray([6, 5], jnp.int32)
    out, kept, pre = blank_collapse_frames(jnp.asarray(lp), lengths, blank=0)
    out, pre = np.asarray(out), np.asarray(pre)
    assert list(np.asarray(kept)) == [3, 3]
    # b=0 keeps frames 0, 4, 5; the 1-3 run folds into kept slot 1 (frame 4)
    np.testing.assert_allclose(out[0, :3], lp[0][[0, 4, 5]])
    np.testing.assert_allclose(pre[0, 1], 3 * np.log(0.9995), rtol=1e-5)
    assert pre[0, 0] < -1e20 and pre[0, 2] < -1e20  # no run before 0 or 5
    # b=1 keeps frames 0, 1, 4 (frame 5 beyond its length)
    np.testing.assert_allclose(out[1, :3], lp[1][[0, 1, 4]])
    np.testing.assert_allclose(pre[1, 2], 2 * np.log(0.9995), rtol=1e-5)


def test_beam_decode_blank_collapse_matches_full():
    """Pruned beam == exact beam on realistically peaked logits (the
    equal-accuracy half of the VERDICT r1 #8 done-criterion)."""
    from megreader_tpu.ops.ctc import ctc_beam_decode

    rng = np.random.default_rng(0)
    B, T, C = 8, 25, 37
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    # make ~60% of frames confidently blank (typical trained CTC posterior)
    for b in range(B):
        for t in range(T):
            if rng.random() < 0.6:
                logits[b, t, 0] = 12.0  # blank logit >> others
            else:
                logits[b, t, rng.integers(1, C)] = 9.0
    lengths = jnp.full((B,), T, jnp.int32)
    ids_full, len_full = ctc_beam_decode(
        jnp.asarray(logits), lengths, beam_width=8, blank_collapse=1.0
    )
    ids_fast, len_fast = ctc_beam_decode(
        jnp.asarray(logits), lengths, beam_width=8, blank_collapse=0.999
    )
    np.testing.assert_array_equal(np.asarray(len_full), np.asarray(len_fast))
    for b in range(B):
        L = int(len_full[b])
        np.testing.assert_array_equal(
            np.asarray(ids_full)[b, :L], np.asarray(ids_fast)[b, :L],
            err_msg=f"batch {b}",
        )
