"""Page-size bucketing tests (avoid jit recompilation storms)."""

import numpy as np

from megreader_tpu.data.bucketing import (
    BucketBatcher,
    DEFAULT_BUCKETS,
    fit_to_bucket,
    pick_bucket,
)


def test_pick_bucket_prefers_fit_then_area():
    assert pick_bucket(600, 600) == (640, 640)
    assert pick_bucket(500, 1000) == (640, 1152)
    assert pick_bucket(1000, 500) == (1152, 640)
    assert pick_bucket(1100, 1100) == (1152, 1152)


def test_fit_to_bucket_scales_and_pads():
    img = np.full((300, 500, 3), 255, np.uint8)
    out = fit_to_bucket(img, (640, 1152))
    assert out["image"].shape == (640, 1152, 3)
    nh, nw = out["valid_hw"]
    assert abs(nw / nh - 500 / 300) < 0.02  # aspect preserved
    # padded region (beyond valid width/height) is zero
    if nw < 1152:
        assert out["image"][:, nw:].max() == 0
    if nh < 640:
        assert out["image"][nh:, :].max() == 0
    # scale maps back to original coords
    assert abs(nw * out["scale"][0] - 500) < 2


def test_bucket_batcher_groups_by_bucket():
    bb = BucketBatcher(batch_size=2)
    ready = []
    shapes = [(600, 600), (500, 1000), (610, 615), (480, 990)]
    for i, (h, w) in enumerate(shapes):
        s = {"image": np.zeros((h, w, 3), np.uint8), "filename": str(i)}
        ready += bb.add(s)
    assert len(ready) == 2  # two buckets filled with 2 each
    shapes_out = {r["image"].shape[1:3] for r in ready}
    assert shapes_out == {(640, 640), (640, 1152)}
    assert bb.flush() == []
    # leftover flushing
    bb.add({"image": np.zeros((640, 640, 3), np.uint8)})
    left = bb.flush()
    assert len(left) == 1 and left[0]["image"].shape[0] == 1
