"""End-to-end pipeline tests (config #5): synthetic page through
detect -> crop -> recognize with an oracle detector prob map.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.core import Charset
from megreader_tpu.models import CTCRecognizer
from megreader_tpu.models.detector import SegDetector
from megreader_tpu.ops.image import crop_resize_boxes
from megreader_tpu.pipelines import E2EPipeline, RecognizerPredictor


def test_crop_resize_boxes_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.random((64, 96, 3)).astype(np.float32)
    boxes = np.array([[[8.0, 10.0, 40.0, 26.0], [50.0, 30.0, 90.0, 60.0]]], np.float32)
    out = np.asarray(
        crop_resize_boxes(jnp.asarray(img[None]), jnp.asarray(boxes), (16, 48))
    )
    for k in range(2):
        x0, y0, x1, y1 = boxes[0, k]
        crop = img[int(y0) : int(y1), int(x0) : int(x1)]
        ref = cv2.resize(crop, (48, 16), interpolation=cv2.INTER_LINEAR)
        # Borders differ by design: we sample the page (true neighboring
        # pixels) where cv2-of-a-slice clamps at the slice edge.
        np.testing.assert_allclose(
            out[0, k][1:-1, 1:-1], ref[1:-1, 1:-1], rtol=1e-3, atol=1e-3
        )


def test_e2e_pipeline_runs_and_masks_invalid():
    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = CTCRecognizer(num_classes=37, hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    H = W = 64
    pages = jnp.asarray(
        np.random.default_rng(1).random((2, H, W, 3)) * 255.0, jnp.float32
    )
    det_vars = det.init(rng, jnp.zeros((2, H, W, 3)))
    rec_vars = rec.init(rng, jnp.zeros((2, 32, 100, 3)))

    pipe = E2EPipeline(det, rec, max_regions=8, box_thresh=0.0, bin_thresh=0.3)
    results = pipe.predict(det_vars, rec_vars, pages)
    assert len(results) == 2
    for page in results:
        for det_item in page:
            assert "text" in det_item and "polygon" in det_item
            assert det_item["polygon"].shape == (4, 2)


def test_recognizer_predictor_strings():
    cs = Charset()
    rec = CTCRecognizer(num_classes=cs.num_classes, hidden=32, num_encoder_layers=1)
    variables = rec.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 100, 3)))
    pred = RecognizerPredictor(rec, cs)
    canv = np.random.default_rng(0).random((2, 64, 256, 3)).astype(np.float32) * 255
    sizes = np.array([[40, 120], [32, 200]], np.int32)
    out = pred.predict(variables, canv, sizes)
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_e2e_deskew_option_runs():
    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = CTCRecognizer(num_classes=37, hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    pages = jnp.asarray(np.random.default_rng(4).random((1, 64, 64, 3)) * 255, jnp.float32)
    det_vars = det.init(rng, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    pipe = E2EPipeline(det, rec, max_regions=4, box_thresh=0.0, deskew=True)
    results = pipe.predict(det_vars, rec_vars, pages)
    assert len(results) == 1


def test_e2e_sharded_serving_matches_single_device():
    """build(mesh=...) partitions the page program over the 'data' axis with
    replicated variables; outputs must match the unsharded program."""
    from megreader_tpu.parallel.mesh import make_mesh

    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = CTCRecognizer(num_classes=37, hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    H = W = 64
    B = 8  # one page per virtual device
    pages = jnp.asarray(
        np.random.default_rng(2).random((B, H, W, 3)) * 255.0, jnp.float32
    )
    det_vars = det.init(rng, jnp.zeros((1, H, W, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))

    pipe = E2EPipeline(det, rec, max_regions=4, box_thresh=0.0, bin_thresh=0.3)
    ref = pipe.build()(det_vars, rec_vars, pages)

    mesh = make_mesh()
    sharded = pipe.build(mesh=mesh)(det_vars, rec_vars, pages)
    assert len(sharded["ids"].sharding.device_set) == 8
    for k in ("ids", "lengths", "valid"):
        np.testing.assert_array_equal(np.asarray(sharded[k]), np.asarray(ref[k]))
    np.testing.assert_allclose(
        np.asarray(sharded["quads"]), np.asarray(ref["quads"]), atol=1e-3
    )


def test_e2e_pipeline_attention_recognizer():
    # the page program composes with the attention family: decode_greedy
    # runs inside the jitted pipeline and ids map through AttentionCharset
    from megreader_tpu.core.charset import AttentionCharset
    from megreader_tpu.models.attention import AttentionRecognizer

    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = AttentionRecognizer(dim=32, width=16, max_len=8)
    rng = jax.random.PRNGKey(0)
    pages = jnp.asarray(
        np.random.default_rng(2).random((1, 64, 64, 3)) * 255, jnp.float32
    )
    det_vars = det.init(rng, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    pipe = E2EPipeline(det, rec, max_regions=4, box_thresh=0.0)
    assert isinstance(pipe.charset, AttentionCharset)
    results = pipe.predict(det_vars, rec_vars, pages)
    assert len(results) == 1
    for item in results[0]:
        assert isinstance(item["text"], str)


def test_e2e_pipeline_ctc2d_recognizer():
    from megreader_tpu.models.recognizer2d import Ctc2dRecognizer

    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = Ctc2dRecognizer(num_classes=37, width=16)
    rng = jax.random.PRNGKey(0)
    pages = jnp.asarray(
        np.random.default_rng(3).random((1, 64, 64, 3)) * 255, jnp.float32
    )
    det_vars = det.init(rng, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    pipe = E2EPipeline(det, rec, max_regions=4, box_thresh=0.0)
    results = pipe.predict(det_vars, rec_vars, pages)
    assert len(results) == 1


def test_e2e_pipeline_beam_mode_matches_types():
    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = CTCRecognizer(num_classes=37, hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    pages = jnp.asarray(
        np.random.default_rng(5).random((1, 64, 64, 3)) * 255, jnp.float32
    )
    det_vars = det.init(rng, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    pipe = E2EPipeline(det, rec, max_regions=4, box_thresh=0.0, rec_mode="beam",
                       beam_width=4)
    results = pipe.predict(det_vars, rec_vars, pages)
    assert len(results) == 1


def test_bucketed_e2e_mixed_sizes():
    # mixed-size pages route to per-bucket programs; polygons come back in
    # ORIGINAL pixel coordinates through the per-page scale
    from megreader_tpu.pipelines import BucketedE2E

    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = CTCRecognizer(num_classes=37, hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    det_vars = det.init(rng, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    pipe = E2EPipeline(det, rec, max_regions=4, box_thresh=0.0)
    buckets = ((64, 64), (64, 128))
    bp = BucketedE2E(pipe, buckets=buckets, batch=2)

    rngn = np.random.default_rng(7)
    images = [
        rngn.random((64, 64, 3)).astype(np.float32) * 255,   # exact bucket 0
        rngn.random((32, 100, 3)).astype(np.float32) * 255,  # scales to (64,128)? no: fits (64,128) at s=1
        rngn.random((128, 128, 3)).astype(np.float32) * 255, # downscales into (64,64)
        rngn.random((64, 120, 3)).astype(np.float32) * 255,  # bucket 1
    ]
    results = bp.predict(det_vars, rec_vars, images)
    assert len(results) == 4
    for img, page in zip(images, results):
        assert page is not None
        h, w = img.shape[:2]
        for det_item in page:
            poly = det_item["polygon"]
            # in ORIGINAL coordinates: the region center must lie on the
            # page (corners may overshoot via unclip expansion)
            assert 0 <= poly[:, 0].mean() <= w and 0 <= poly[:, 1].mean() <= h
            assert np.isfinite(poly).all()
            assert isinstance(det_item["text"], str)
