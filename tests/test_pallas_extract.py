"""Pallas region extraction vs the XLA reference path (ops/ccl).

Runs the Pallas interpreter on CPU. The two paths share exact integer
semantics (roots, raster-rank compaction, areas, top-K selection) and
differ only in f32 accumulation order for the moment sums, so: roots and
areas must match exactly; centroids/theta/extents to tight tolerances.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from megreader_tpu.ops.ccl import (
    connected_components,
    extract_regions,
    regions_to_quads,
)
from megreader_tpu.ops.pallas_extract import extract_regions_pallas


def _random_blob_mask(rng, hw=(96, 128), n_blobs=6):
    H, W = hw
    m = np.zeros((H, W), bool)
    for _ in range(n_blobs):
        h = rng.integers(3, 14)
        w = rng.integers(4, 30)
        y = rng.integers(0, H - h)
        x = rng.integers(0, W - w)
        m[y : y + h, x : x + w] = True
    return m


def _compare(mask_np, scores_np, K, candidates="xla"):
    labels = connected_components(jnp.asarray(mask_np), impl="xla")
    scores = jnp.asarray(scores_np)
    ref = extract_regions(labels, scores, max_regions=K)
    got = extract_regions_pallas(
        labels, scores, max_regions=K, interpret=True, candidates=candidates
    )

    np.testing.assert_array_equal(np.asarray(got["valid"]), np.asarray(ref["valid"]))
    np.testing.assert_array_equal(np.asarray(got["area"]), np.asarray(ref["area"]))
    v = np.asarray(ref["valid"])
    for key, tol in [
        ("score", 1e-5),
        ("center", 1e-3),
        ("theta", 1e-3),
        ("extent_u", 5e-3),
        ("extent_v", 5e-3),
    ]:
        r = np.asarray(ref[key])[v]
        g = np.asarray(got[key])[v]
        np.testing.assert_allclose(g, r, atol=tol, rtol=1e-4, err_msg=key)
    return ref, got


def test_extract_matches_xla_random_blobs():
    rng = np.random.default_rng(0)
    masks = np.stack([_random_blob_mask(rng) for _ in range(2)])
    scores = rng.random(masks.shape).astype(np.float32) * masks
    _compare(masks, scores, K=8)


def test_extract_rotated_bar_quads_match():
    # one rotated bar: principal-axis quad must agree between paths
    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W]
    cy, cx, th = 48.0, 64.0, 0.5
    u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
    v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
    mask = (np.abs(u) < 35) & (np.abs(v) < 6)
    scores = mask.astype(np.float32) * 0.9
    ref, got = _compare(mask[None], scores[None], K=4)
    q_ref = np.asarray(regions_to_quads(ref))
    q_got = np.asarray(regions_to_quads(got))
    valid = np.asarray(ref["valid"])[0]
    np.testing.assert_allclose(q_got[0][valid], q_ref[0][valid], atol=0.01)


def test_extract_more_components_than_k():
    # 12 blobs, K=4: top-K-by-area selection must agree exactly
    rng = np.random.default_rng(3)
    mask = _random_blob_mask(rng, n_blobs=12)
    scores = np.full(mask.shape, 0.5, np.float32) * mask
    _compare(mask[None], scores[None], K=4)


def test_extract_pallas_candidates_kernel():
    # the standalone candidates kernel (impl='pallas_full') must agree with
    # the XLA candidate phase exactly: same raster-rank compaction, same
    # fused root-assignment/area pass semantics
    rng = np.random.default_rng(11)
    masks = np.stack(
        [_random_blob_mask(rng, n_blobs=9) for _ in range(2)]
    )
    scores = rng.random(masks.shape).astype(np.float32) * masks
    _compare(masks, scores, K=6, candidates="pallas")


def test_extract_empty_mask():
    mask = np.zeros((2, 64, 128), bool)
    scores = np.zeros((2, 64, 128), np.float32)
    labels = connected_components(jnp.asarray(mask), impl="xla")
    got = extract_regions_pallas(labels, jnp.asarray(scores), max_regions=4, interpret=True)
    assert not np.asarray(got["valid"]).any()


def test_extract_nonaligned_shapes():
    # H, W not multiples of the strip/lane tiles exercise the -1 padding
    rng = np.random.default_rng(7)
    mask = _random_blob_mask(rng, hw=(70, 130), n_blobs=5)
    scores = rng.random(mask.shape).astype(np.float32) * mask
    _compare(mask[None], scores[None], K=6)
