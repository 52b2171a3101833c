"""Connected components + region extraction vs cv2 oracle (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from megreader_tpu.ops.ccl import (
    connected_components,
    extract_regions,
    regions_to_quads,
    unclip_distance_for,
)


def _random_blobs(rng, H=64, W=96, n=5):
    mask = np.zeros((H, W), bool)
    for _ in range(n):
        cy, cx = rng.integers(8, H - 8), rng.integers(8, W - 8)
        h, w = rng.integers(3, 10), rng.integers(3, 14)
        mask[max(0, cy - h // 2) : cy + h // 2 + 1, max(0, cx - w // 2) : cx + w // 2 + 1] = True
    return mask


def test_ccl_matches_cv2_component_count_and_membership():
    import cv2

    rng = np.random.default_rng(0)
    masks = np.stack([_random_blobs(rng) for _ in range(3)])
    labels = np.asarray(connected_components(jnp.asarray(masks)))

    for b in range(masks.shape[0]):
        n_cv, cv_lbl = cv2.connectedComponents(
            masks[b].astype(np.uint8), connectivity=4
        )
        ours = labels[b]
        # same number of components
        ours_ids = np.unique(ours[ours >= 0])
        assert len(ours_ids) == n_cv - 1
        # identical pixel partitions: map cv label -> our label must be 1:1
        pairs = set()
        for cv_id in range(1, n_cv):
            sel = cv_lbl == cv_id
            got = np.unique(ours[sel])
            assert len(got) == 1  # one component, one label
            pairs.add(int(got[0]))
        assert len(pairs) == n_cv - 1


def test_ccl_snake():
    # A long snake tests label propagation speed (pointer jumping).
    H, W = 32, 32
    mask = np.zeros((H, W), bool)
    for r in range(0, H, 2):
        mask[r, :] = True
        if (r // 2) % 2 == 0 and r + 1 < H:
            mask[r + 1, W - 1] = True
        elif r + 1 < H:
            mask[r + 1, 0] = True
    labels = np.asarray(connected_components(jnp.asarray(mask[None])))[0]
    ids = np.unique(labels[labels >= 0])
    assert len(ids) == 1  # all one snake


def test_extract_regions_boxes():
    mask = np.zeros((48, 64), bool)
    mask[10:20, 5:25] = True  # box A: 10x20 at (5..24, 10..19)
    mask[30:34, 40:60] = True  # box B: 4x20
    scores = mask.astype(np.float32) * 0.8
    labels = connected_components(jnp.asarray(mask[None]))
    stats = extract_regions(labels, jnp.asarray(scores[None]), max_regions=8)

    valid = np.asarray(stats["valid"][0])
    assert valid.sum() == 2
    areas = sorted(np.asarray(stats["area"][0])[valid].tolist(), reverse=True)
    assert areas == [200.0, 80.0]
    np.testing.assert_allclose(np.asarray(stats["score"][0])[valid], 0.8, rtol=1e-5)

    quads = np.asarray(regions_to_quads(stats))[0]
    # The largest region's quad should cover x in [4.5, 24.5], y in [9.5, 19.5]
    order = np.argsort(-np.asarray(stats["area"][0]))
    q = quads[order[0]]
    assert q[:, 0].min() == pytest.approx(4.5, abs=0.6)
    assert q[:, 0].max() == pytest.approx(24.5, abs=0.6)
    assert q[:, 1].min() == pytest.approx(9.5, abs=0.6)
    assert q[:, 1].max() == pytest.approx(19.5, abs=0.6)


def test_rotated_region_angle():
    # A 45° diagonal strip should produce theta ~ ±45°.
    H = W = 64
    mask = np.zeros((H, W), bool)
    for i in range(40):
        y, x = 10 + i // 2, 10 + i // 2
        mask[y : y + 3, x : x + 3] = True
    labels = connected_components(jnp.asarray(mask[None]))
    stats = extract_regions(labels, jnp.asarray(mask[None].astype(np.float32)), max_regions=4)
    th = float(np.asarray(stats["theta"][0][0]))
    assert abs(abs(th) - np.pi / 4) < 0.15


def test_unclip_grows_box():
    mask = np.zeros((32, 32), bool)
    mask[8:16, 8:24] = True
    labels = connected_components(jnp.asarray(mask[None]))
    stats = extract_regions(labels, jnp.asarray(mask[None].astype(np.float32)), max_regions=4)
    d = unclip_distance_for(stats, ratio=1.5)
    q0 = np.asarray(regions_to_quads(stats))[0, 0]
    q1 = np.asarray(regions_to_quads(stats, d))[0, 0]
    w0 = q0[:, 0].max() - q0[:, 0].min()
    w1 = q1[:, 0].max() - q1[:, 0].min()
    assert w1 > w0
    assert float(d[0, 0]) > 0


def test_unclip_inverse_recovers_shrink():
    """Shrink a rect by the training formula D = A(1-r^2)/P of the ORIGINAL,
    then check unclip_distance_inverse recovers D exactly from the shrunk
    dims (rect closed form), across aspect ratios and shrink ratios."""
    from megreader_tpu.ops.ccl import unclip_distance_inverse

    for r in (0.3, 0.4, 0.6):
        for (w, h) in ((100.0, 20.0), (40.0, 40.0), (250.0, 14.0)):
            D = w * h * (1.0 - r * r) / (2.0 * (w + h))
            wp, hp = w - 2 * D, h - 2 * D
            assert wp > 0 and hp > 0, (w, h, r)
            # build stats whose extent+1 == shrunk dims (extent convention
            # of unclip_distance_for: pixel-center extents)
            stats = {
                "extent_u": jnp.asarray([[[0.0, wp - 1.0]]]),
                "extent_v": jnp.asarray([[[0.0, hp - 1.0]]]),
                "valid": jnp.asarray([[True]]),
            }
            d = float(unclip_distance_inverse(stats, shrink_ratio=r)[0, 0])
            assert abs(d - D) < 1e-3 * max(D, 1.0), (r, w, h, d, D)


def test_unclip_inverse_beats_heuristic_on_elongated():
    """For an elongated shrunk kernel the heuristic d = A'*1.5/P' must
    under-expand vs the exact inverse (the measured failure mode)."""
    from megreader_tpu.ops.ccl import unclip_distance_inverse

    stats = {
        "extent_u": jnp.asarray([[[0.0, 199.0]]]),  # w' = 200
        "extent_v": jnp.asarray([[[0.0, 7.0]]]),    # h' = 8
        "valid": jnp.asarray([[True]]),
    }
    d_heur = float(unclip_distance_for(stats, ratio=1.5)[0, 0])
    d_inv = float(unclip_distance_inverse(stats, shrink_ratio=0.4)[0, 0])
    assert d_inv > 1.5 * d_heur, (d_heur, d_inv)


def test_multigrid_ccl_identical_labels():
    """Multigrid seeding must produce EXACTLY the flat solve's labels
    (same fixed point: min linear index per component)."""
    from megreader_tpu.ops.ccl import connected_components

    rng = np.random.default_rng(0)
    masks = []
    # text-ish blobs
    m = np.zeros((64, 96), bool)
    m[10:20, 5:40] = True
    m[30:42, 50:90] = True
    m[50:54, 10:80] = True  # thin wide stroke
    masks.append(m)
    # random blobs incl. 1-px structures that erode away at half res
    r = rng.random((64, 96)) < 0.35
    masks.append(r)
    # diagonal-adjacent components must stay separate
    m2 = np.zeros((64, 96), bool)
    m2[10:20, 10:20] = True
    m2[20:30, 20:30] = True  # shares only the corner pixel boundary
    masks.append(m2)
    batch = jnp.asarray(np.stack(masks))

    flat = np.asarray(connected_components(batch, max_iters=64, multigrid=False))
    mg = np.asarray(connected_components(batch, max_iters=64, multigrid=True))
    np.testing.assert_array_equal(flat, mg)


def test_multigrid_ccl_fused_context():
    """Multigrid CCL must stay correct when the mask is COMPUTED inside a
    larger jitted program (regression: an XLA fusion miscompile on the TPU
    backend evaluated a ``prob > t`` mask inconsistently across use sites in
    the multigrid path, labeling most pixels with the ``big`` sentinel; an
    optimization_barrier in connected_components guards it)."""
    import jax

    from megreader_tpu.ops.ccl import connected_components

    rng = np.random.default_rng(3)
    prob = jnp.asarray(rng.random((2, 64, 96)).astype(np.float32))
    sep = np.asarray(connected_components(prob > 0.6, max_iters=64, multigrid=True))

    @jax.jit
    def fused(p):
        return connected_components(p > 0.6, max_iters=64, multigrid=True)

    np.testing.assert_array_equal(sep, np.asarray(fused(prob)))


def test_multigrid_ccl_odd_size():
    from megreader_tpu.ops.ccl import connected_components

    m = np.zeros((33, 47), bool)
    m[5:12, 3:30] = True
    m[20:30, 10:45] = True
    flat = np.asarray(connected_components(jnp.asarray(m)[None], 64, multigrid=False))
    mg = np.asarray(connected_components(jnp.asarray(m)[None], 64, multigrid=True))
    np.testing.assert_array_equal(flat, mg)
