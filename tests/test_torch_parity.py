"""Checkpoint-conversion parity: torch twin -> flax, same outputs.

This is the proof of the parity toolchain (SURVEY.md §7 step 1): random
torch weights, converted to flax, must reproduce activations to fp32
round-off and greedy transcriptions exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def twins():
    import torch

    from megreader_tpu.compat.torch_convert import convert_state_dict
    from megreader_tpu.compat.torch_ref import TorchCTCRecognizer, flax_state_dict
    from megreader_tpu.models import CTCRecognizerNet

    torch.manual_seed(0)
    tmodel = TorchCTCRecognizer(num_classes=37, hidden=48, num_encoder_layers=1, width=16)
    # Randomize: default BN running stats are trivial; perturb them too.
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0, 0.08)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()

    fmodel = CTCRecognizerNet(num_classes=37, hidden=48, num_encoder_layers=1)
    # width=16 trunk: build a matching flax net via custom ResNet width.
    from megreader_tpu.models.resnet import BasicBlock, ResNet

    import flax.linen as fnn

    class SmallNet(fnn.Module):
        @fnn.compact
        def __call__(self, images, train=False):
            feat = ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), variant="rec", width=16)(
                images, train=train
            )
            seq = jnp.mean(feat, axis=1)
            from megreader_tpu.models.sequence import BiLSTM

            seq = BiLSTM(48, name="encoder_layer0")(seq)
            return fnn.Dense(37, name="classifier")(seq)

    fmodel = SmallNet()
    rng = jax.random.PRNGKey(0)
    variables = fmodel.init(rng, jnp.zeros((1, 32, 100, 3)))

    sd = flax_state_dict(tmodel)
    sd = {k.replace("encoder.layer0", "encoder_layer0"): v for k, v in sd.items()}
    converted = convert_state_dict(sd)
    converted = jax.tree_util.tree_map(jnp.asarray, converted)

    return tmodel, fmodel, variables, converted


def test_converted_tree_matches(twins):
    tmodel, fmodel, variables, converted = twins
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables)
    conv_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(conv_shapes)
    assert ref_shapes == conv_shapes


def test_activation_parity(twins):
    import torch

    tmodel, fmodel, variables, converted = twins
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 32, 100, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()

    f_out = np.asarray(fmodel.apply(converted, jnp.asarray(img)))
    # XLA and torch accumulate convs in different orders; fp32 round-off
    # only. The decode-level parity test below is the exact gate.
    np.testing.assert_allclose(f_out, t_out, rtol=0, atol=2e-3)


def test_greedy_transcription_parity(twins):
    import torch

    from megreader_tpu.core import Charset
    from megreader_tpu.ops.ctc import ctc_greedy_decode

    tmodel, fmodel, variables, converted = twins
    cs = Charset()
    rng = np.random.default_rng(1)
    img = rng.standard_normal((4, 32, 100, 3)).astype(np.float32)

    with torch.no_grad():
        t_logits = tmodel(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()
    f_logits = np.asarray(fmodel.apply(converted, jnp.asarray(img)))

    T = t_logits.shape[1]
    lengths = jnp.full((4,), T, dtype=jnp.int32)
    t_ids, t_len = ctc_greedy_decode(jnp.asarray(t_logits), lengths)
    f_ids, f_len = ctc_greedy_decode(jnp.asarray(f_logits), lengths)
    t_strs = cs.decode_batch(np.asarray(t_ids), np.asarray(t_len))
    f_strs = cs.decode_batch(np.asarray(f_ids), np.asarray(f_len))
    assert t_strs == f_strs  # bit-for-bit transcription parity
