"""CTC recognizer assembly: shapes, train/eval, gradient flow, decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.models import CTCRecognizer, CTCRecognizerNet


@pytest.fixture(scope="module")
def model_and_vars():
    model = CTCRecognizer(num_classes=37, hidden=64, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((2, 32, 100, 3), jnp.float32)
    variables = model.init(rng, images)
    return model, variables


def test_forward_shape(model_and_vars):
    model, variables = model_and_vars
    images = jnp.zeros((2, 32, 100, 3), jnp.float32)
    logits = model.apply(variables, images)
    assert logits.shape == (2, 25, 37)


def test_train_loss_and_grad(model_and_vars):
    model, variables = model_and_vars
    batch = {
        "image": jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 100, 3)), jnp.float32),
        "label": jnp.asarray([[1, 2, 3, 0, 0], [4, 5, 0, 0, 0]], jnp.int32),
        "label_length": jnp.asarray([3, 2], jnp.int32),
    }

    def loss_fn(params):
        loss, _ = model.loss({"params": params, "batch_stats": variables["batch_stats"]}, batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaf_norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert sum(1 for n in leaf_norms if n > 0) > len(leaf_norms) * 0.9


def test_decode_modes(model_and_vars):
    model, variables = model_and_vars
    images = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 100, 3)), jnp.float32
    )
    ids_g, len_g = model.decode(variables, images, mode="greedy")
    ids_b, len_b = model.decode(variables, images, mode="beam", beam_width=4)
    assert ids_g.shape[0] == 2 and ids_b.shape[0] == 2
    assert int(len_g.max()) <= 25 and int(len_b.max()) <= 25


def test_transformer_encoder_variant():
    model = CTCRecognizer(num_classes=37, encoder="transformer", hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, 32, 100, 3), jnp.float32)
    variables = model.init(rng, images)
    logits = model.apply(variables, images)
    assert logits.shape == (1, 25, 37)


@pytest.mark.parametrize("backbone,feat", [("resnet34", 512), ("resnet50", 2048)])
def test_deeper_backbones(backbone, feat):
    from megreader_tpu.models.resnet import resnet_variant

    net = resnet_variant(backbone, "rec")
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 100, 3)))
    out = net.apply(variables, jnp.zeros((1, 32, 100, 3)))
    assert out.shape == (1, 2, 25, feat)

    det = resnet_variant(backbone, "det")
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    feats = det.apply(dv, jnp.zeros((1, 64, 64, 3)))
    assert len(feats) == 4
    assert feats[0].shape[1] == 16 and feats[3].shape[1] == 2
