"""Attention recognizer tests: loss/grad, greedy + beam decode (config #3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.core import AttentionCharset
from megreader_tpu.models.attention import AttentionRecognizer


@pytest.fixture(scope="module")
def setup():
    model = AttentionRecognizer(num_classes=39, dim=64, max_len=12)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 100, 3)), jnp.float32
    )
    variables = model.init(rng, images)
    return model, variables, images


def test_teacher_forced_loss_and_grad(setup):
    model, variables, images = setup
    cs = AttentionCharset()
    labels, lengths = cs.encode_batch(["ab3", "q"], 12)
    batch = {
        "image": images,
        "label": jnp.asarray(labels),
        "label_length": jnp.asarray(lengths),
    }

    def loss_fn(params):
        loss, _ = model.loss(
            {"params": params, "batch_stats": variables["batch_stats"]}, batch
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gsum > 0


def test_greedy_decode_shapes(setup):
    model, variables, images = setup
    ids, lens = model.decode_greedy(variables, images)
    assert ids.shape == (2, 12)
    assert lens.shape == (2,)
    assert int(lens.max()) <= 12
    # after EOS everything is PAD
    for b in range(2):
        row = np.asarray(ids[b])
        if AttentionCharset.EOS in row:
            e = list(row).index(AttentionCharset.EOS)
            assert all(v == AttentionCharset.PAD for v in row[e + 1 :])


def test_beam_decode_consistent_with_greedy_on_peaked(setup):
    model, variables, images = setup
    gi, gl = model.decode_greedy(variables, images)
    bi, bl = model.decode_beam(variables, images, beam_width=1)
    # beam_width=1 IS greedy
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(bl))
    for b in range(2):
        n = int(gl[b])
        np.testing.assert_array_equal(np.asarray(gi[b][:n]), np.asarray(bi[b][:n]))


def test_beam_score_at_least_greedy(setup):
    model, variables, images = setup
    # Score a decoded sequence under teacher forcing; wider beam must be >=.
    def seq_logp(ids, length):
        B, T = ids.shape
        go = jnp.full((B, 1), AttentionCharset.GO, jnp.int32)
        tin = jnp.concatenate([go, ids[:, : T - 1]], axis=1)
        logits = model.net.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            images, tin, train=False,
        )
        logp = jax.nn.log_softmax(logits, -1)
        tok = jnp.take_along_axis(logp, ids[:, :, None], axis=2)[..., 0]
        mask = jnp.arange(T)[None] < length[:, None]
        return jnp.sum(jnp.where(mask, tok, 0.0), axis=1)

    gi, gl = model.decode_greedy(variables, images)
    bi, bl = model.decode_beam(variables, images, beam_width=4)
    sg = np.asarray(seq_logp(gi, gl))
    sb = np.asarray(seq_logp(bi, bl))
    assert np.all(sb >= sg - 1e-3)
