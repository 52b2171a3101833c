"""Hard synthetic tier (data/hard_synth.py): rendering, chains, GT, datasets."""

import numpy as np
import pytest

from megreader_tpu.core.charset import Charset
from megreader_tpu.data.hard_synth import (
    HardSyntheticDetectionDataset,
    HardSyntheticRecognitionDataset,
    available_fonts,
    chain_seg_maps,
    chains_to_polygon,
    degrade_image,
    render_word,
    sample_text,
    shrink_chains,
)
from megreader_tpu.data.loader import recognition_collate


def test_fonts_available():
    fonts = available_fonts()
    # 6 DejaVu TTFs + 5 Hershey faces on this image
    assert len(fonts) >= 8
    kinds = {k for k, _ in fonts}
    assert kinds == {"ttf", "hershey"}


@pytest.mark.parametrize("kind", ["ttf", "hershey"])
@pytest.mark.parametrize("curve", [0.0, 0.6, -0.5])
def test_render_word_shapes(kind, curve):
    fonts = [f for f in available_fonts() if f[0] == kind]
    rng = np.random.default_rng(0)
    w = render_word(rng, "reading42", fonts[0], 28, curve=curve)
    mask, top, bot = w["mask"], w["top"], w["bot"]
    assert mask.ndim == 2 and mask.max() <= 1.0 and (mask > 0.5).sum() > 50
    n_pts = 2 if curve == 0.0 else len("reading42") + 1
    assert top.shape == (n_pts, 2) and bot.shape == (n_pts, 2)
    # chains bracket the ink: >=97% of ink pixels inside the polygon
    import cv2

    poly = chains_to_polygon(top, bot)
    inside = np.zeros(mask.shape, np.uint8)
    cv2.fillPoly(inside, [np.round(poly).astype(np.int32)], 1)
    ink = mask > 0.5
    assert (inside[ink].mean()) > 0.97


def test_curved_differs_from_straight():
    f = available_fonts()[0]
    s = render_word(np.random.default_rng(0), "reading", f, 24, curve=0.0)
    c = render_word(np.random.default_rng(0), "reading", f, 24, curve=0.7)
    # the arc adds vertical extent
    assert c["mask"].shape[0] > s["mask"].shape[0] + 5


def test_shrink_dilate_chains():
    import cv2

    f = available_fonts()[0]
    w = render_word(np.random.default_rng(1), "curved", f, 30, curve=0.5)
    top, bot = w["top"], w["bot"]

    def area(t, b):
        poly = chains_to_polygon(t, b)
        H = int(poly[:, 1].max()) + 4
        W = int(poly[:, 0].max()) + 4
        img = np.zeros((H, W), np.uint8)
        cv2.fillPoly(img, [np.round(poly).astype(np.int32)], 1)
        return img.sum(), img

    a0, full = area(top, bot)
    st, sb = shrink_chains(top, bot, 4.0)
    a1, shrunk = area(st, sb)
    dt, db = shrink_chains(top, bot, -4.0)
    a2, _ = area(dt, db)
    assert a1 < a0 < a2
    # shrunk region stays inside the original band
    H = min(full.shape[0], shrunk.shape[0])
    W = min(full.shape[1], shrunk.shape[1])
    outside = shrunk[:H, :W] & (1 - full[:H, :W])
    assert outside.sum() <= 0.01 * a1


def test_chain_seg_maps():
    f = available_fonts()[2]
    w = render_word(np.random.default_rng(2), "people", f, 30, curve=0.6)
    off = np.array([40.0, 40.0], np.float32)
    words = [{"top": w["top"] + off, "bot": w["bot"] + off, "ignore": False}]
    maps = chain_seg_maps(words, (160, 320))
    assert maps["gt"].sum() > 50
    assert maps["mask"].min() == 1.0  # nothing ignored
    assert 0.29 <= maps["thresh_map"].min() <= 0.31
    assert maps["thresh_map"].max() <= 0.71
    # shrunk gt sits inside the thresh band's outer polygon
    assert (maps["gt"] * maps["thresh_mask"]).sum() == maps["gt"].sum()
    # ignored word knocks out the valid mask instead
    words[0]["ignore"] = True
    maps2 = chain_seg_maps(words, (160, 320))
    assert maps2["gt"].sum() == 0 and maps2["mask"].min() == 0.0


def test_degrade_strength_zero_is_identity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    out, meta = degrade_image(rng, img.copy(), strength=0.0)
    np.testing.assert_array_equal(out, img)


def test_sample_text_respects_alphabet():
    rng = np.random.default_rng(0)
    cs = Charset()
    for _ in range(50):
        t = sample_text(rng, cs.alphabet)
        assert 1 <= len(t) <= 10
        assert all(c in cs.alphabet for c in t)


def test_recognition_dataset_items_and_collate():
    ds = HardSyntheticRecognitionDataset(n=8, seed=0)
    items = [ds[i] for i in range(8)]
    for it in items:
        assert it["image"].shape == (64, 256, 3) and it["image"].dtype == np.uint8
        h, w = it["size"]
        assert 0 < h <= 64 and 0 < w <= 256
        assert len(it["text"]) >= 1
        assert {"font", "polarity", "curve", "height"} <= set(it["meta"])
    # determinism
    again = HardSyntheticRecognitionDataset(n=8, seed=0)[3]
    np.testing.assert_array_equal(again["image"], items[3]["image"])
    # collate drops meta, encodes labels
    batch = recognition_collate(items, Charset(), max_label_len=16)
    assert batch["image"].shape == (8, 64, 256, 3)
    assert batch["label"].shape == (8, 16)
    assert "meta" not in batch


def test_recognition_dataset_condition_knobs():
    easy = HardSyntheticRecognitionDataset(
        n=4, seed=1, curve_prob=0.0, degrade=0.0, distractors=False,
        fonts="hershey", polarity="light",
    )
    for i in range(4):
        it = easy[i]
        assert it["meta"]["curve"] == 0.0
        assert it["meta"]["blur"] == 0.0 and it["meta"]["jpeg"] == 100
        assert it["meta"]["polarity"] == "light"
        assert it["meta"]["font"].startswith("hershey")


def test_detection_dataset_items():
    ds = HardSyntheticDetectionDataset(n=3, hw=(320, 320), seed=0,
                                       words_range=(3, 5))
    it = ds[0]
    assert it["image"].shape == (320, 320, 3)
    assert len(it["polygons"]) == len(it["texts"]) >= 1
    for p in it["polygons"]:
        assert p.ndim == 2 and p.shape[1] == 2 and p.shape[0] >= 4
        assert p[:, 0].min() >= 0 and p[:, 0].max() < 320
    assert it["gt"].shape == (320, 320) and it["gt"].sum() > 0
    assert {"thresh_map", "thresh_mask", "mask"} <= set(it)
    # determinism
    it2 = HardSyntheticDetectionDataset(n=3, hw=(320, 320), seed=0,
                                        words_range=(3, 5))[0]
    np.testing.assert_array_equal(it["image"], it2["image"])


def test_detection_dataset_curved_polys_present():
    ds = HardSyntheticDetectionDataset(
        n=6, hw=(448, 448), seed=2, curve_prob=1.0, max_rotate=0.0
    )
    n_curved = 0
    for i in range(6):
        for p in ds[i]["polygons"]:
            if len(p) > 4:
                n_curved += 1
    assert n_curved >= 3


def test_mixture_dataset_interleaves_proportionally():
    from megreader_tpu.data.datasets import (
        MixtureDataset,
        SyntheticRecognitionDataset,
    )

    a = HardSyntheticRecognitionDataset(n=12, seed=0)
    b = SyntheticRecognitionDataset(n=4, seed=1)
    mix = MixtureDataset([a, b])
    assert len(mix) == 16
    # every sample appears exactly once, interleaved (not concatenated)
    first_half_kinds = [mix._index[i][0] for i in range(8)]
    assert 0 in first_half_kinds and 1 in first_half_kinds
    seen = set(mix._index)
    assert len(seen) == 16
    item = mix[0]
    assert {"image", "size", "text"} <= set(item)
