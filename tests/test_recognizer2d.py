"""2D-CTC recognizer assembly tests (judged config #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.models import Ctc2dRecognizer


@pytest.mark.parametrize("transition", ["independent", "markov"])
def test_forward_loss_decode(transition):
    model = Ctc2dRecognizer(num_classes=37, transition=transition)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 100, 3)), jnp.float32
    )
    variables = model.init(rng, images)

    heads = model.apply(variables, images)
    emit = heads[0]
    assert emit.shape == (2, 25, 4, 37)

    batch = {
        "image": images,
        "label": jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32),
        "label_length": jnp.asarray([3, 2], jnp.int32),
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

    ids, lens = model.decode(variables, images)
    assert ids.shape[0] == 2 and int(lens.max()) <= 25


def test_beam_decode_independent():
    model = Ctc2dRecognizer(num_classes=37, transition="independent", loss_impl="xla")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 100, 3)), jnp.float32
    )
    variables = model.init(rng, images)
    gi, gl = model.decode(variables, images, mode="greedy")
    bi, bl = model.decode(variables, images, mode="beam", beam_width=4)
    assert bi.shape[0] == 2 and int(bl.max()) <= 25


def test_loss_impl_selection():
    # auto resolves to xla off-TPU; pallas numeric equivalence is covered by
    # tests/test_pallas_ctc2d.py in interpret mode.
    model = Ctc2dRecognizer(num_classes=37, transition="markov", loss_impl="auto")
    assert model.loss_impl == "xla"
