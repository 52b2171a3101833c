"""Deformable conv sampling vs a naive per-pixel numpy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.models.deform import DeformableConv, deform_sample


def _naive_sample(x, offsets, modulation, kernel=3, R=2):
    B, H, W, C = x.shape
    K = kernel * kernel
    half = kernel // 2
    taps = [(ky, kx) for ky in range(-half, half + 1) for kx in range(-half, half + 1)]
    out = np.zeros((B, H, W, K, C), np.float32)
    for b in range(B):
        for y in range(H):
            for xx in range(W):
                for k, (ky, kx) in enumerate(taps):
                    dy = np.clip(offsets[b, y, xx, 2 * k], -R, R)
                    dx = np.clip(offsets[b, y, xx, 2 * k + 1], -R, R)
                    ty, tx = y + ky + dy, xx + kx + dx
                    y0, x0 = int(np.floor(ty)), int(np.floor(tx))
                    fy, fx = ty - y0, tx - x0
                    val = np.zeros(C, np.float32)
                    for (yy, wy) in ((y0, 1 - fy), (y0 + 1, fy)):
                        for (xxx, wx) in ((x0, 1 - fx), (x0 + 1, fx)):
                            if 0 <= yy < H and 0 <= xxx < W:
                                val += wy * wx * x[b, yy, xxx]
                    out[b, y, xx, k] = val * modulation[b, y, xx, k]
    return out


def test_deform_sample_matches_naive():
    rng = np.random.default_rng(0)
    B, H, W, C, K = 1, 6, 7, 3, 9
    x = rng.random((B, H, W, C)).astype(np.float32)
    offsets = (rng.random((B, H, W, 2 * K)).astype(np.float32) - 0.5) * 4
    modulation = rng.random((B, H, W, K)).astype(np.float32)

    ref = _naive_sample(x, offsets, modulation)
    got = np.asarray(
        deform_sample(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(modulation))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_zero_offsets_equal_plain_conv_receptive_field():
    # With zero offsets and modulation 1, tap k samples x at p + p_k exactly.
    rng = np.random.default_rng(1)
    x = rng.random((1, 5, 5, 2)).astype(np.float32)
    offsets = np.zeros((1, 5, 5, 18), np.float32)
    modulation = np.ones((1, 5, 5, 9), np.float32)
    got = np.asarray(deform_sample(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(modulation)))
    # center tap (k=4) == x itself
    np.testing.assert_allclose(got[0, :, :, 4], x[0], atol=1e-6)
    # tap (0): (ky,kx)=(-1,-1): shifted
    np.testing.assert_allclose(got[0, 1:, 1:, 0], x[0, :-1, :-1], atol=1e-6)


def test_deformable_conv_module():
    model = DeformableConv(features=8)
    x = jnp.asarray(np.random.default_rng(2).random((2, 8, 8, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 8, 8, 8)
    g = jax.grad(lambda v: jnp.sum(model.apply(v, x) ** 2))(variables)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_resnet_dcn_variant():
    from megreader_tpu.models.resnet import ResNet, BasicBlock

    net = ResNet(block=BasicBlock, stage_sizes=(1, 1, 1, 1), variant="det",
                 width=8, dcn_stages=(3, 4))
    x = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(variables, x)
    assert len(feats) == 4
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    keys = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("offset_conv" in k for k in keys)  # DCN params exist
