"""Pallas VMEM-resident CCL vs the XLA scan solve (itself cv2-verified) —
interpret mode on CPU; labels must match bit-for-bit."""

import numpy as np
import pytest

import jax.numpy as jnp

from megreader_tpu.ops.ccl import connected_components
from megreader_tpu.ops.pallas_ccl import connected_components_pallas


def _cases():
    rng = np.random.default_rng(0)
    masks = []
    # text-ish blobs
    m = np.zeros((64, 96), bool)
    m[10:20, 5:40] = True
    m[30:42, 50:90] = True
    m[50:54, 10:80] = True
    masks.append(m)
    # random speckle incl. single pixels
    masks.append(rng.random((64, 96)) < 0.35)
    # diagonal-adjacent components must stay separate (4-connectivity)
    m2 = np.zeros((64, 96), bool)
    m2[10:20, 10:20] = True
    m2[20:30, 20:30] = True
    masks.append(m2)
    # serpentine (stresses the sweep count)
    m3 = np.zeros((64, 96), bool)
    for k, r in enumerate(range(4, 60, 8)):
        m3[r : r + 4, 4:92] = True
        if k % 2 == 0:
            m3[r + 4 : r + 8, 88:92] = True
        else:
            m3[r + 4 : r + 8, 4:8] = True
    masks.append(m3)
    return masks


def test_pallas_ccl_matches_xla_batched():
    batch = jnp.asarray(np.stack(_cases()[:3]))  # same (64, 96) shapes
    ref = np.asarray(connected_components(batch, max_iters=64))
    got = np.asarray(
        connected_components_pallas(batch, max_iters=64, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_pallas_ccl_serpentine():
    m = jnp.asarray(_cases()[3][None])
    ref = np.asarray(connected_components(m, max_iters=64))
    got = np.asarray(connected_components_pallas(m, max_iters=64, interpret=True))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("hw", [(33, 47), (40, 100)])
def test_pallas_ccl_unaligned_shapes(hw):
    """Shapes that need tile padding: labels must still use the original
    width stride and padded regions must not leak."""
    rng = np.random.default_rng(5)
    m = jnp.asarray((rng.random((2, *hw)) < 0.4))
    ref = np.asarray(connected_components(m, max_iters=64))
    got = np.asarray(connected_components_pallas(m, max_iters=64, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_ccl_empty_and_full():
    m = jnp.asarray(
        np.stack([np.zeros((16, 128), bool), np.ones((16, 128), bool)])
    )
    ref = np.asarray(connected_components(m, max_iters=64))
    got = np.asarray(connected_components_pallas(m, max_iters=64, interpret=True))
    np.testing.assert_array_equal(ref, got)
