"""Device GT rasterization (ops/gt_maps.py) vs the host cv2/numpy oracle
(data/processes.py) — the two paths implement the same MakeSegDetectionData /
MakeBorderMap semantics (SURVEY.md §2.2); the device one is exact geometry,
the host one is cv2 integer rasterization, so agreement is checked at the
region level with a small boundary-pixel budget."""

import numpy as np
import pytest

import jax.numpy as jnp

from megreader_tpu.data.processes import make_border_maps, make_seg_maps
from megreader_tpu.ops.gt_maps import make_detection_gt, pad_polygons


def _quad(x0, y0, w, h, rot=0.0):
    c = np.array([x0 + w / 2, y0 + h / 2])
    pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
    R = np.array([[np.cos(rot), -np.sin(rot)], [np.sin(rot), np.cos(rot)]])
    return (pts @ R.T + c).astype(np.float32)


CASES = [
    # (polys, ignore)
    ([_quad(20, 30, 60, 18)], [False]),
    ([_quad(10, 10, 50, 16), _quad(70, 60, 40, 20)], [False, False]),
    ([_quad(15, 25, 55, 17, rot=0.3)], [False]),  # rotated quad
    ([_quad(20, 20, 60, 18), _quad(30, 70, 50, 16)], [False, True]),  # one ignored
    ([_quad(40, 40, 3, 2)], [False]),  # tiny -> masked out
]


@pytest.mark.parametrize("case_i", range(len(CASES)))
def test_device_gt_matches_host(case_i):
    polys, ignore = CASES[case_i]
    H = W = 128
    host_seg = make_seg_maps(polys, ignore, (H, W))
    host_border = make_border_maps(polys, ignore, (H, W))

    buf, valid, ign = pad_polygons(polys, ignore, max_polys=4)
    dev = make_detection_gt(
        jnp.asarray(buf)[None], jnp.asarray(valid)[None], jnp.asarray(ign)[None],
        hw=(H, W),
    )
    d_gt = np.asarray(dev["gt"][0])
    d_mask = np.asarray(dev["mask"][0])
    d_tm = np.asarray(dev["thresh_map"][0])
    d_tmask = np.asarray(dev["thresh_mask"][0])

    # region agreement: differing pixels confined to the rasterization
    # boundary (cv2 casts vertices to int; device samples exact centers)
    def boundary_budget(a, b, name, budget):
        diff = (a > 0.5) != (b > 0.5)
        frac = diff.mean()
        assert frac <= budget, f"{name}: {frac:.4f} of pixels differ"

    boundary_budget(d_gt, host_seg["gt"], "gt", 0.01)
    boundary_budget(d_mask, host_seg["mask"], "mask", 0.01)
    boundary_budget(d_tmask, host_border["thresh_mask"], "thresh_mask", 0.02)
    # threshold map: continuous target, compare where both agree on support
    both = (d_tmask > 0.5) & (host_border["thresh_mask"] > 0.5)
    if both.any():
        err = np.abs(d_tm - host_border["thresh_map"])[both]
        assert err.mean() < 0.03, f"thresh_map mean err {err.mean():.4f}"


def test_tiled_rasterization_identical_to_dense():
    """The bbox-tile fast path must reproduce the dense full-page maps
    bit-for-bit — including via the lax.cond fallback when a polygon's
    dilated bbox exceeds the tile."""
    H = W = 128
    configs = [
        # fits comfortably in a (48, 96) tile
        ([_quad(20, 30, 60, 18), _quad(70, 80, 40, 20, rot=0.4)], [False, False]),
        # near the page edges (origin clamping)
        ([_quad(0, 0, 50, 16), _quad(75, 108, 50, 16)], [False, False]),
        # one ignored + one tiny/degenerate
        ([_quad(20, 20, 60, 18), _quad(30, 70, 50, 16), _quad(90, 40, 3, 2)],
         [False, True, False]),
        # oversized polygon -> dense fallback for the whole page
        ([_quad(5, 5, 115, 60), _quad(20, 100, 40, 14)], [False, False]),
    ]
    for polys, ignore in configs:
        buf, valid, ign = pad_polygons(polys, ignore, max_polys=4)
        args = (jnp.asarray(buf)[None], jnp.asarray(valid)[None], jnp.asarray(ign)[None])
        dense = make_detection_gt(*args, hw=(H, W), tile_hw=None)
        tiled = make_detection_gt(*args, hw=(H, W), tile_hw=(48, 96))
        for k in ("gt", "mask", "thresh_map", "thresh_mask"):
            np.testing.assert_array_equal(
                np.asarray(dense[k]), np.asarray(tiled[k]), err_msg=k
            )


def test_device_gt_batched_and_empty():
    H = W = 64
    polys0, ignore0 = [_quad(10, 10, 30, 12)], [False]
    buf0, v0, i0 = pad_polygons(polys0, ignore0, max_polys=4)
    buf1, v1, i1 = pad_polygons([], [], max_polys=4)  # empty page
    dev = make_detection_gt(
        jnp.asarray(np.stack([buf0, buf1])),
        jnp.asarray(np.stack([v0, v1])),
        jnp.asarray(np.stack([i0, i1])),
        hw=(H, W),
    )
    assert dev["gt"].shape == (2, H, W)
    assert float(dev["gt"][1].sum()) == 0.0  # nothing on the empty page
    assert float(dev["mask"][1].min()) == 1.0  # fully valid
    assert float(dev["gt"][0].sum()) > 0.0


def test_experiment_device_gt_wiring():
    """Detection Experiment defaults to the device-GT path: poly collate,
    dataset host rasterization disabled, prepared batch has all loss keys."""
    from megreader_tpu.data import SyntheticDetectionDataset
    from megreader_tpu.experiment import Experiment
    from megreader_tpu.models.detector import SegDetector

    ds = SyntheticDetectionDataset(n=2, hw=(128, 128))
    exp = Experiment(
        model=SegDetector(fpn_dim=32, head_dim=8),
        train_dataset=ds,
        batch_size=2,
        use_mesh=False,
    )
    assert ds.gt_maps is False
    raw = next(iter(exp.train_loader))
    assert "polys" in raw and "gt" not in raw
    prepared = exp.prepare(raw)
    for k in ("image", "gt", "mask", "thresh_map", "thresh_mask"):
        assert k in prepared, k
    assert prepared["gt"].shape == (2, 128, 128)
    # loss runs end-to-end on the device-generated targets
    import jax

    state = exp.model.init(jax.random.PRNGKey(0), prepared["image"])
    loss, _ = exp.model.loss(state, prepared, train=False)
    assert np.isfinite(float(loss))
