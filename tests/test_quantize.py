"""int8 serving path (ops/quantize.py): numerics + interception coverage."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megreader_tpu.ops.quantize import int8_methods


class _TinyConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), strides=(2, 2), name="c2")(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(4, name="head")(x)


def test_int8_conv_dense_close_to_fp32():
    m = _TinyConvNet()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    v = m.init(rng, x)
    ref = m.apply(v, x)
    q = int8_methods(m.apply)(v, x)
    assert q.shape == ref.shape
    # dynamic per-tensor activation + per-channel weight quant through two
    # convs + a dense: a few percent of the output scale
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    err = float(jnp.max(jnp.abs(q - ref))) / scale
    assert err < 0.08, err


def test_int8_weight_roundtrip_exact():
    # weights already on the int8 grid quantize losslessly
    class _One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (1, 1), use_bias=False, name="c")(x)

    m = _One()
    x = jnp.round(jnp.linspace(-127, 127, 2 * 4 * 4 * 3)).reshape(2, 4, 4, 3)
    v = m.init(jax.random.PRNGKey(0), x)
    k = np.zeros((1, 1, 3, 4), np.float32)
    # per-out-channel grids: channel c uses step (c+1)
    for c in range(4):
        k[0, 0, :, c] = (np.arange(3) - 1) * (c + 1)
    v = {"params": {"c": {"kernel": jnp.asarray(k)}}}
    ref = m.apply(v, x)
    q = int8_methods(m.apply)(v, x)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref), rtol=1e-5, atol=1e-3)


def test_int8_skip_names():
    m = _TinyConvNet()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    all_q = int8_methods(m.apply)(v, x)
    part_q = int8_methods(m.apply, skip_names=frozenset({"c1", "c2", "head"}))(v, x)
    # skipping everything reproduces fp32 exactly; quantizing doesn't
    np.testing.assert_allclose(np.asarray(part_q), np.asarray(ref), rtol=1e-6)
    assert float(jnp.max(jnp.abs(all_q - ref))) > 0


def test_int8_detector_forward():
    # the real serving detector traces + runs under interception
    from megreader_tpu.models.detector import SegDetector

    det = SegDetector(backbone="resnet18", compute_dtype="bfloat16")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = det.init(jax.random.PRNGKey(0), x)
    maps_ref = det.predict_maps(v, x)
    maps_q = int8_methods(det.predict_maps)(v, x)
    assert set(maps_q) == set(maps_ref)
    for k in maps_q:
        assert maps_q[k].shape == maps_ref[k].shape, k
        assert np.isfinite(np.asarray(maps_q[k], np.float32)).all(), k


def test_int8_recognizer_forward():
    from megreader_tpu.models.recognizer import CTCRecognizer

    rec = CTCRecognizer(num_classes=25, backbone="resnet18")
    x = jnp.zeros((2, 32, 100, 3), jnp.float32)
    v = rec.init(jax.random.PRNGKey(0), x)
    ref = rec.logits(v, x) if hasattr(rec, "logits") else rec.apply(v, x)
    q = (
        int8_methods(rec.logits)(v, x)
        if hasattr(rec, "logits")
        else int8_methods(rec.apply)(v, x)
    )
    assert q.shape == ref.shape
    assert np.isfinite(np.asarray(q, np.float32)).all()
