"""2D-CTC loss/decode vs a brute-force path-enumeration oracle.

The oracle enumerates every path ((h_1,c_1)..(h_T,c_T)) on tiny shapes and
sums the probability of paths whose class sequence CTC-collapses to the
label — the definitional ground truth (arXiv:1907.09705 semantics).
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.ops.ctc2d import (
    ctc2d_greedy_decode,
    ctc2d_loss_independent,
    ctc2d_loss_markov,
    ctc2d_viterbi_height_decode,
    fuse_heights,
)


def _collapse(seq, blank=0):
    out = []
    prev = None
    for c in seq:
        if c != prev and c != blank:
            out.append(c)
        prev = c
    return tuple(out)


def _brute_force_nll(emit, height=None, trans=None, init=None, label=(), blank=0):
    """emit: (T,H,C) probs; independent: height (T,H); markov: trans (T,H,H), init (H,)."""
    T, H, C = emit.shape
    total = 0.0
    for hs in itertools.product(range(H), repeat=T):
        for cs in itertools.product(range(C), repeat=T):
            if _collapse(cs, blank) != tuple(label):
                continue
            p = 1.0
            for t in range(T):
                p *= emit[t, hs[t], cs[t]]
            if height is not None:
                for t in range(T):
                    p *= height[t, hs[t]]
            else:
                p *= init[hs[0]]
                for t in range(1, T):
                    p *= trans[t, hs[t - 1], hs[t]]
            total += p
    return -np.log(total)


def _random_dists(rng, T, H, C):
    emit = rng.random((T, H, C)) + 0.1
    emit /= emit.sum(-1, keepdims=True)
    height = rng.random((T, H)) + 0.1
    height /= height.sum(-1, keepdims=True)
    trans = rng.random((T, H, H)) + 0.1
    trans /= trans.sum(-1, keepdims=True)
    init = rng.random((H,)) + 0.1
    init /= init.sum()
    return emit, height, trans, init


@pytest.mark.parametrize("label", [(1,), (1, 2), (1, 1)])
def test_independent_matches_brute_force(label):
    rng = np.random.default_rng(0)
    T, H, C = 4, 2, 3
    emit, height, _, _ = _random_dists(rng, T, H, C)
    ref = _brute_force_nll(emit, height=height, label=label)

    L = len(label)
    nll = ctc2d_loss_independent(
        jnp.log(emit)[None],
        jnp.log(height)[None],
        jnp.asarray([T]),
        jnp.asarray([list(label)]),
        jnp.asarray([L]),
        reduction="none",
    )
    np.testing.assert_allclose(float(nll[0]), ref, rtol=1e-4)


@pytest.mark.parametrize("label", [(1,), (1, 2), (2, 2)])
def test_markov_matches_brute_force(label):
    rng = np.random.default_rng(1)
    T, H, C = 4, 2, 3
    emit, _, trans, init = _random_dists(rng, T, H, C)
    ref = _brute_force_nll(emit, trans=trans, init=init, label=label)

    nll = ctc2d_loss_markov(
        jnp.log(emit)[None],
        jnp.log(trans)[None],
        jnp.log(init)[None],
        jnp.asarray([T]),
        jnp.asarray([list(label)]),
        jnp.asarray([len(label)]),
        reduction="none",
    )
    np.testing.assert_allclose(float(nll[0]), ref, rtol=1e-4)


def test_markov_reduces_to_independent():
    # A_t(h'->h) = q_t(h) for all h' makes the chain independent.
    rng = np.random.default_rng(2)
    T, H, C = 5, 3, 4
    emit, height, _, _ = _random_dists(rng, T, H, C)
    trans = np.broadcast_to(height[:, None, :], (T, H, H)).copy()
    label = [1, 3]

    nll_ind = ctc2d_loss_independent(
        jnp.log(emit)[None], jnp.log(height)[None],
        jnp.asarray([T]), jnp.asarray([label]), jnp.asarray([2]), reduction="none",
    )
    nll_mkv = ctc2d_loss_markov(
        jnp.log(emit)[None], jnp.log(trans)[None], jnp.log(height[0])[None],
        jnp.asarray([T]), jnp.asarray([label]), jnp.asarray([2]), reduction="none",
    )
    np.testing.assert_allclose(float(nll_ind[0]), float(nll_mkv[0]), rtol=1e-4)


def test_gradients_finite():
    rng = np.random.default_rng(3)
    T, H, C = 6, 4, 5
    emit, height, trans, init = _random_dists(rng, T, H, C)

    def loss(e):
        return ctc2d_loss_independent(
            jax.nn.log_softmax(e, -1)[None], jnp.log(height)[None],
            jnp.asarray([T]), jnp.asarray([[1, 2, 3]]), jnp.asarray([3]),
        )

    g = jax.grad(loss)(jnp.asarray(emit, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_greedy_decode_picks_best_height_path():
    # Construct: height 0 says class 1 then 2; height 1 says garbage; height
    # distribution prefers h=0.
    T, H, C = 4, 2, 4
    emit = np.full((T, H, C), 1e-3)
    for t, c in enumerate([1, 1, 0, 2]):
        emit[t, 0, c] = 1.0
    emit[:, 1, 3] = 1.0
    emit /= emit.sum(-1, keepdims=True)
    height = np.array([[0.9, 0.1]] * T)
    ids, lens = ctc2d_greedy_decode(
        jnp.log(emit)[None], jnp.log(height)[None], jnp.asarray([T])
    )
    assert int(lens[0]) == 2
    assert list(np.asarray(ids[0][:2])) == [1, 2]


def test_viterbi_height_decode():
    # Transitions force staying at h=1 after starting there.
    T, H, C = 3, 2, 3
    emit = np.full((T, H, C), 1e-3)
    for t, c in enumerate([1, 2, 1]):
        emit[t, 1, c] = 1.0
    emit[:, 0, 0] = 1.0
    emit /= emit.sum(-1, keepdims=True)
    init = np.array([0.1, 0.9])
    trans = np.tile(np.array([[0.5, 0.5], [0.02, 0.98]]), (T, 1, 1))
    ids, lens = ctc2d_viterbi_height_decode(
        jnp.log(emit)[None], jnp.log(trans)[None], jnp.log(init)[None], jnp.asarray([T])
    )
    assert int(lens[0]) == 3
    assert list(np.asarray(ids[0][:3])) == [1, 2, 1]
