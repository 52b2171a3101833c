"""Detector model + representer + measurer tests (config #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.models.detector import SegDetector
from megreader_tpu.postproc import (
    DetectionMeasurer,
    RecognitionMeasurer,
    SegDetectorRepresenter,
    polygon_iou,
)


def test_detector_forward_and_loss():
    model = SegDetector(fpn_dim=64, head_dim=16)
    rng = jax.random.PRNGKey(0)
    H = W = 64
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, H, W, 3)), jnp.float32
    )
    variables = model.init(rng, images)
    maps = model.predict_maps(variables, images)
    assert maps["prob"].shape == (1, H, W)
    assert maps["binary"].shape == (1, H, W)

    gt = np.zeros((1, H, W), np.float32)
    gt[0, 20:30, 10:40] = 1.0
    batch = {
        "image": images,
        "gt": jnp.asarray(gt),
        "mask": jnp.ones((1, H, W), jnp.float32),
        "thresh_map": jnp.asarray(gt * 0.5),
        "thresh_mask": jnp.asarray(gt),
    }

    def loss_fn(params):
        loss, (metrics, _) = model.loss(
            {"params": params, "batch_stats": variables["batch_stats"]}, batch
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gsum > 0


def test_fused_upsample_head_matches_resize_conv():
    """The phase-composed upsample head must reproduce the
    [2x bilinear resize -> zero-padded 3x3 conv] formulation on the SAME
    parameters — interior AND all borders/corners (fp32)."""
    from megreader_tpu.models.detector import MapHead

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 40, 32)).astype(np.float32))
    slow = MapHead(dim=16, fused_upsample=False)
    fast = MapHead(dim=16, fused_upsample=True)
    v = slow.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(slow.apply(v, x))
    got = np.asarray(fast.apply(v, x))  # identical param tree
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=2e-6)


def test_fused_upsample_full_detector_same_params():
    """Full SegDetector: fused and slow heads share checkpoints and
    produce the same maps."""
    slow = SegDetector(fpn_dim=32, head_dim=16, fused_upsample=False)
    fast = SegDetector(fpn_dim=32, head_dim=16, fused_upsample=True)
    x = jnp.asarray(
        np.random.default_rng(1).random((1, 64, 96, 3)).astype(np.float32)
    )
    v = slow.init(jax.random.PRNGKey(0), x)
    ref = slow.apply(v, x, train=False)
    got = fast.apply(v, x, train=False)
    for k in ("prob", "thresh", "binary"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=2e-6,
            err_msg=k,
        )


def test_representer_extracts_boxes():
    H, W = 64, 96
    prob = np.zeros((1, H, W), np.float32)
    prob[0, 10:20, 8:40] = 0.95
    prob[0, 40:52, 50:80] = 0.9
    rep = SegDetectorRepresenter(bin_thresh=0.3, box_thresh=0.5, unclip_ratio=0.0)
    results = rep.represent(jnp.asarray(prob))
    assert len(results) == 1
    polys = results[0]["polygons"]
    assert polys.shape[0] == 2
    assert np.all(results[0]["scores"] >= 0.5)


def test_representer_scales_to_original():
    prob = np.zeros((1, 32, 32), np.float32)
    prob[0, 8:16, 8:24] = 1.0
    rep = SegDetectorRepresenter(box_thresh=0.5, unclip_ratio=0.0)
    res = rep.represent(jnp.asarray(prob), scales=np.array([[2.0, 4.0]]))
    q = res[0]["polygons"][0]
    assert q[:, 0].max() > 40  # scaled x
    assert q[:, 1].max() > 50  # scaled y


def test_resize_matmul_matches_jax_image():
    """The separable tent-matrix resize (MXU matmuls) must equal
    jax.image.resize bilinear for upscales — round-5: the gather-based
    lowering cost 0.88 ms/iter across the FPN."""
    from megreader_tpu.models.detector import _resize_to

    rng = np.random.default_rng(0)
    for (H, W, h, w, C) in [(20, 20, 160, 160, 7), (40, 44, 160, 176, 5),
                            (16, 16, 32, 32, 4)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        a = np.asarray(_resize_to(x, h, w))
        b = np.asarray(jax.image.resize(x, (2, h, w, C), method="bilinear"))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_polygon_iou_basic():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    b = np.array([[5, 0], [15, 0], [15, 10], [5, 10]], np.float64)
    assert polygon_iou(a, b) == pytest.approx(1 / 3, abs=1e-6)
    assert polygon_iou(a, a) == pytest.approx(1.0, abs=1e-6)


def test_polygon_iou_nonconvex_chain():
    """Round-5 regression: Sutherland-Hodgman is convex-only; before the
    raster fallback, non-convex chain polygons (curved words) scored ~0
    against their own GT and every curved detection page read H-mean 0.0
    — a measurer artifact. Oracles: identity IoU 1.0; an L-shape vs its
    bounding square has hand-computable intersection (the L itself)."""
    from megreader_tpu.postproc.measurers import (
        is_convex,
        polygon_intersection_area,
    )

    # banana: top chain left->right then bottom chain right->left
    xs = np.linspace(0, 100, 9)
    top = np.stack([xs, 20 + 15 * np.sin(xs / 100 * np.pi) - 8], axis=1)
    bot = np.stack([xs, 20 + 15 * np.sin(xs / 100 * np.pi) + 8], axis=1)
    banana = np.concatenate([top, bot[::-1]], axis=0)
    assert not is_convex(banana)
    assert polygon_iou(banana, banana) == pytest.approx(1.0, abs=0.02)
    # shifted copy: overlap well below 1, above 0
    iou = polygon_iou(banana, banana + np.array([30.0, 0.0]))
    assert 0.05 < iou < 0.8

    # L-shape (area 300) inside its 20x20 bbox square (area 400):
    # inter = 300 -> IoU = 300/400
    L = np.array(
        [[0, 0], [20, 0], [20, 10], [10, 10], [10, 20], [0, 20]], np.float64
    )
    sq = np.array([[0, 0], [20, 0], [20, 20], [0, 20]], np.float64)
    assert not is_convex(L)
    # raster boundary bias ~perimeter/(2*SS): a few percent at this scale
    assert polygon_intersection_area(L, sq) == pytest.approx(300.0, rel=0.05)
    assert polygon_iou(L, sq) == pytest.approx(0.75, abs=0.03)
    # convex pair still takes the exact path
    assert is_convex(sq)


def test_detection_measurer_protocol():
    m = DetectionMeasurer()
    gt = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64),
        np.array([[20, 20], [30, 20], [30, 30], [20, 30]], np.float64),
        np.array([[50, 50], [60, 50], [60, 60], [50, 60]], np.float64),  # ignored
    ]
    ignored = [False, False, True]
    preds = [
        np.array([[1, 1], [10, 1], [10, 10], [1, 10]], np.float64),  # match gt0
        np.array([[51, 51], [59, 51], [59, 59], [51, 59]], np.float64),  # in ignore
        np.array([[80, 80], [90, 80], [90, 90], [80, 90]], np.float64),  # FP
    ]
    raw = m.measure_one(preds, gt, ignored)
    assert raw == {"tp": 1, "n_pred": 2, "n_gt": 2}
    agg = m.gather([raw])
    assert agg["precision"] == pytest.approx(0.5)
    assert agg["recall"] == pytest.approx(0.5)
    assert agg["hmean"] == pytest.approx(0.5)


def test_recognition_measurer():
    m = RecognitionMeasurer()
    out = m.measure(["hello", "world", "abc"], ["hello", "World", "abd"])
    assert out["accuracy"] == pytest.approx(2 / 3)
    assert out["ned"] == pytest.approx((1.0 + 1.0 + (1 - 1 / 3)) / 3)


def test_deteval_protocol():
    from megreader_tpu.postproc.measurers import DetEvalMeasurer

    m = DetEvalMeasurer()

    def box(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)

    gt = [box(0, 0, 100, 20), box(0, 40, 100, 60)]
    ignored = [False, False]

    # one-to-one on gt0; split (two halves) on gt1
    preds = [
        box(1, 1, 99, 19),
        box(0, 40, 50, 60),
        box(50, 40, 100, 60),
    ]
    raw = m.measure_one(preds, gt, ignored)
    assert raw["recall_acc"] == pytest.approx(1.0 + 0.8)
    assert raw["precision_acc"] == pytest.approx(1.0 + 0.8 + 0.8)
    agg = m.gather([raw])
    assert agg["recall"] == pytest.approx(1.8 / 2)
    assert agg["precision"] == pytest.approx(2.6 / 3)

    # merge: one det covers both gts
    preds2 = [box(0, 0, 100, 60)]
    raw2 = m.measure_one(preds2, gt, ignored)
    assert raw2["recall_acc"] == pytest.approx(1.6)
    assert raw2["precision_acc"] == pytest.approx(0.8)


def test_prob_only_heads_match_full_apply():
    # serving path: heads=('prob',) must reproduce the full apply's prob map
    # exactly while leaving the thresh-head params untouched
    model = SegDetector(fpn_dim=64, head_dim=16)
    rng = jax.random.PRNGKey(1)
    images = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(rng, images)
    full = model.apply(variables, images)
    prob_only = model.apply(variables, images, heads=("prob",))
    assert set(prob_only.keys()) == {"prob"}
    np.testing.assert_array_equal(
        np.asarray(prob_only["prob"]), np.asarray(full["prob"])
    )
    thresh_only = model.apply(variables, images, heads=("thresh",))
    np.testing.assert_array_equal(
        np.asarray(thresh_only["thresh"]), np.asarray(full["thresh"])
    )


def test_s2d_stem_exact():
    # the space-to-depth stem must be bit-compatible with the direct 7x7 s2
    # conv: same param tree (stem_conv/kernel), numerically equal maps
    from megreader_tpu.models.resnet import resnet18

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 96, 3)), jnp.float32
    )
    direct = resnet18(variant="det")
    s2d = resnet18(variant="det", stem_s2d=True)
    v = direct.init(rng, x, train=False)
    v2 = s2d.init(jax.random.PRNGKey(1), x, train=False)
    # identical param trees -> checkpoints interchange both ways
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    a = direct.apply(v, x, train=False)
    b = s2d.apply(v, x, train=False)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=1e-5, atol=1e-5
        )


def test_s2d4_stem_exact():
    """The 4x4 space-to-depth stem (conv+BN+relu+maxpool composed at H/4,
    round-5 profile-guided rewrite of the 3.7%-MFU direct stem) must be
    numerically equal to the direct chain on every output, including all
    borders, with an identical param tree."""
    from megreader_tpu.models.resnet import resnet18

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 64, 96, 3)) * 2.0,
        jnp.float32,
    )
    direct = resnet18(variant="det")
    s2d4 = resnet18(variant="det", stem_s2d4=True)
    v = direct.init(rng, x, train=False)
    v2 = s2d4.init(jax.random.PRNGKey(1), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    a = direct.apply(v, x, train=False)
    b = s2d4.apply(v, x, train=False)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=1e-5, atol=1e-5
        )
    # train mode: batch stats reduce over the same multiset of activations
    a2, mut = direct.apply(v, x, train=True, mutable=["batch_stats"])
    b2, mut2 = s2d4.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["stem_bn"]["mean"]),
        np.asarray(mut2["batch_stats"]["stem_bn"]["mean"]),
        rtol=1e-5, atol=1e-5,
    )


def test_s2d_stem_exact_via_segdetector():
    model = SegDetector(fpn_dim=64, head_dim=16)
    model2 = SegDetector(fpn_dim=64, head_dim=16, stem_s2d=True)
    rng = jax.random.PRNGKey(2)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    v = model.init(rng, x)
    a = model.apply(v, x, heads=("prob",))["prob"]
    b = model2.apply(v, x, heads=("prob",))["prob"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_packed_serving_head_matches_full_path():
    """The packed serving tail (everything at low res, phases as channels,
    one final depth-to-space) must be EXACT vs the reference formulation,
    including all borders/corners and a non-identity BN affine."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from megreader_tpu.models.detector import MapHead

    rng = np.random.default_rng(0)
    for (h, w, dim) in [(12, 10, 16), (7, 9, 8)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 32)), jnp.float32)
        head_a = MapHead(dim, packed_serving=True, analytic_borders=True)
        head_s = MapHead(dim, packed_serving=True, analytic_borders=False)
        head_f = MapHead(dim, packed_serving=False)
        variables = head_a.init(jax.random.PRNGKey(0), x, train=False)
        bs = jax.tree.map(
            lambda a: a + 0.3 * np.abs(rng.normal(size=a.shape)).astype(a.dtype),
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": bs}
        out_f = head_f.apply(variables, x, train=False)
        for head_p in (head_a, head_s):
            out_p = head_p.apply(variables, x, train=False)
            np.testing.assert_allclose(out_p, out_f, atol=2e-6)
        head_p = head_a
    # train mode ignores the packed path (canonical BN stats tensor)
    y, st = head_p.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert y.shape == (2, 4 * h, 4 * w)


def test_upconv_naive_mode_matches_full():
    """_UpConv(mode='naive') is the literal resize->zero-padded-conv
    reference formulation; 'full' is the fused composition. They must
    agree everywhere (incl. borders). 'naive' exists because the packed
    head's border strips were re-timed through it (round 5b) — it
    measured SLOWER and tail_full stays the default, but the mode
    documents the reference chain and pins the fused path against it."""
    from megreader_tpu.models.detector import _UpConv

    rng = np.random.default_rng(3)
    for (h, w, cin, cout) in [(9, 11, 8, 4), (6, 6, 3, 5)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)), jnp.float32)
        mod = _UpConv(cout)
        v = mod.init(jax.random.PRNGKey(1), x)
        a = mod.apply(v, x, mode="full")
        b = mod.apply(v, x, mode="naive")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        )
