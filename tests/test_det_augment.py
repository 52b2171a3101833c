"""Polygon-consistent detection augmentation tests."""

import numpy as np

from megreader_tpu.data.det_augment import (
    augment_detection_sample,
    random_crop_biased,
    random_flip,
    random_scale,
)


def _sample():
    img = np.zeros((100, 200, 3), np.uint8)
    img[40:60, 50:120] = 200
    poly = np.array([[50, 40], [120, 40], [120, 60], [50, 60]], np.float32)
    return img, [poly], [False]


def test_flip_maps_polygons():
    img, polys, ign = _sample()
    rng = np.random.default_rng(0)
    img2, polys2 = random_flip(rng, img, polys, prob=1.0)
    W = img.shape[1]
    assert np.isclose(polys2[0][:, 0].min(), W - 1 - 120)
    assert np.isclose(polys2[0][:, 0].max(), W - 1 - 50)
    # pixel content flipped consistently: text band still at y 40:60
    assert img2[50, W - 1 - 60, 0] == 200


def test_scale_maps_polygons():
    img, polys, ign = _sample()
    rng = np.random.default_rng(1)
    img2, polys2 = random_scale(rng, img, polys, scales=(2.0,))
    assert img2.shape[0] == 200 and img2.shape[1] == 400
    assert np.isclose(polys2[0][:, 0].max(), 240)


def test_crop_keeps_text():
    img, polys, ign = _sample()
    rng = np.random.default_rng(2)
    for _ in range(5):
        crop, p2, i2 = random_crop_biased(rng, img, polys, ign, (80, 80))
        assert crop.shape[:2] == (80, 80)
        # either the polygon survived fully inside, or there were no fits
        for q in p2:
            assert (q >= 0).all() and (q[:, 0] < 80).all() and (q[:, 1] < 80).all()


def test_augment_pipeline_shapes():
    img, polys, ign = _sample()
    rng = np.random.default_rng(3)
    out = augment_detection_sample(rng, img, polys, ign, crop_hw=(64, 64))
    assert out["image"].shape[:2] == (64, 64)
    assert isinstance(out["polygons"], list)
