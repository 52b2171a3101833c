"""Native C++ geometry kernels vs numpy/cv2 oracles."""

import numpy as np
import pytest

from megreader_tpu import native
from megreader_tpu.data.processes import offset_polygon_numpy as np_offset
from megreader_tpu.postproc.measurers import polygon_iou as np_iou


@pytest.fixture(scope="module", autouse=True)
def require_native():
    out = native.polygon_iou(
        np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64),
        np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64),
    )
    if out is None:
        pytest.skip("native toolchain unavailable")


def test_offset_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        c = rng.random(2) * 50 + 25
        angles = np.sort(rng.random(4) * 2 * np.pi)
        r = rng.random(4) * 10 + 6
        poly = np.stack([c[0] + r * np.cos(angles), c[1] + r * np.sin(angles)], 1)
        for d in (-1.5, 2.0):
            a = np_offset(poly, d)
            b = native.offset_polygon(poly, d)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_iou_matches_numpy():
    rng = np.random.default_rng(1)
    for _ in range(20):
        p1 = rng.random((4, 2)) * 40
        p2 = p1 + rng.standard_normal(2) * 8
        # make convex quads (axis boxes + jitter corners convexly): use boxes
        x0, y0, w, h = rng.random(4) * 20 + 2
        q1 = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
        q2 = q1 + rng.standard_normal(2) * 6
        a = np_iou(q1, q2)
        b = native.polygon_iou(q1, q2)
        assert b == pytest.approx(a, abs=1e-6)


def test_batch_quad_iou():
    q = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    preds = np.stack([q, q + 5, q + 100])
    gts = np.stack([q, q + 20])
    m = native.batch_quad_iou(preds, gts)
    assert m.shape == (3, 2)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[1, 0] == pytest.approx(25 / 175, abs=1e-6)
    assert m[2, 0] == 0.0


def test_ccl_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    mask = rng.random((64, 80)) > 0.7
    ours = native.connected_components(mask)
    n_cv, cv_lbl = cv2.connectedComponents(mask.astype(np.uint8), connectivity=4)
    assert ours.max() == n_cv - 1
    # identical partitions
    for cid in range(1, n_cv):
        got = np.unique(ours[cv_lbl == cid])
        assert len(got) == 1 and got[0] > 0
