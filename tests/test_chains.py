"""Chain (polygon) extraction + curved rectification tests (ops/chains.py).

The reference emits contour-approx polygons for curved text (SURVEY.md
§2.5); these tests pin the TPU-native chain formulation: band stats vs a
numpy oracle on a synthetic sine band, graceful degradation to the rotated
rect on straight strips, and the actual point of it all — the piecewise
unwarp straightening a curved strip that a single homography cannot.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from megreader_tpu.ops.ccl import connected_components, extract_regions
from megreader_tpu.ops.chains import (
    chain_arc_length,
    chains_to_band_quads,
    chains_to_polygons,
    extract_chains,
    resample_width,
)


def sine_band_mask(H=96, W=192, x0=20, x1=172, amp=14.0, half_h=7, cy=48):
    """Boolean mask of a constant-thickness band along y = cy + amp*sin."""
    mask = np.zeros((H, W), bool)
    xs = np.arange(x0, x1)
    phase = (xs - x0) / (x1 - x0) * np.pi  # half period: a CUTE80-ish arc
    centers = cy + amp * np.sin(phase)
    for x, c in zip(xs, centers):
        lo, hi = int(round(c - half_h)), int(round(c + half_h))
        mask[lo : hi + 1, x] = True
    return mask, (x0, x1, amp, half_h, cy)


def _run_chains(mask, n_bands=8):
    m = jnp.asarray(mask[None])
    labels = connected_components(m, max_iters=32)
    stats = extract_regions(labels, m.astype(jnp.float32), max_regions=4)
    chains = extract_chains(labels, stats, n_bands=n_bands)
    return stats, chains


def test_chain_spine_follows_sine_band():
    mask, (x0, x1, amp, half_h, cy) = sine_band_mask()
    stats, chains = _run_chains(mask, n_bands=8)
    pts = np.asarray(chains["points"])[0, 0]  # (S+1, 2)
    hh = np.asarray(chains["half_h"])[0, 0]
    assert np.asarray(stats["valid"])[0, 0]
    # spine x spans the band, monotonically (theta may flip direction)
    xs = pts[:, 0]
    if xs[0] > xs[-1]:
        pts = pts[::-1]
        xs = pts[:, 0]
    assert xs[0] <= x0 + 6 and xs[-1] >= x1 - 6
    # each interior spine point sits near the true sine center
    for x, y in pts[1:-1]:
        phase = (x - x0) / (x1 - x0) * np.pi
        y_true = cy + amp * np.sin(np.clip(phase, 0, np.pi))
        assert abs(y - y_true) < 2.5, (x, y, y_true)
    # local half-heights recover the band thickness (not the quad's
    # amp-inflated v extent — that is the whole failure of quad mode)
    assert np.all(np.abs(hh[1:-1] - half_h) < 2.0)


def test_chain_quads_and_polygons_shapes_and_continuity():
    mask, _ = sine_band_mask()
    stats, chains = _run_chains(mask, n_bands=6)
    d = jnp.full((1, 4), 2.0)
    bq = np.asarray(chains_to_band_quads(chains, d))
    poly = np.asarray(chains_to_polygons(chains, d))
    assert bq.shape == (1, 4, 6, 4, 2)
    assert poly.shape == (1, 4, 14, 2)
    # adjacent bands share their boundary edge exactly (C0 continuity)
    np.testing.assert_allclose(bq[0, 0, :-1, 1], bq[0, 0, 1:, 0], atol=1e-4)
    np.testing.assert_allclose(bq[0, 0, :-1, 2], bq[0, 0, 1:, 3], atol=1e-4)


def test_straight_strip_degrades_to_rect():
    """On a straight strip the chain spine is a line and band half-heights
    equal the strip's — chain mode is safe as the only mode."""
    mask = np.zeros((64, 128), bool)
    mask[28:41, 10:118] = True  # 13 px tall strip
    stats, chains = _run_chains(mask, n_bands=8)
    pts = np.asarray(chains["points"])[0, 0]
    hh = np.asarray(chains["half_h"])[0, 0]
    assert np.all(np.abs(pts[:, 1] - 34.0) < 0.75)
    assert np.all(np.abs(hh - 6.5) < 1.0)
    L = float(np.asarray(chain_arc_length(chains))[0, 0])
    assert abs(L - 108) < 6


def test_resample_width_left_aligns_and_masks():
    crops = jnp.ones((2, 3, 8, 40, 1))
    out = np.asarray(resample_width(crops, jnp.full((2, 3), 25.0), 50))
    assert out.shape == (2, 3, 8, 50, 1)
    assert np.all(out[..., :24, :] > 0.9)
    assert np.all(out[..., 26:, :] == 0.0)


def test_chain_unwarp_straightens_curved_strip():
    """The measure that matters: ink coverage of the rectified crop's
    middle rows. A sine band whose amplitude is 2x its half-height leaves
    a perspective (quad) crop mostly background at any given row; the
    chain unwarp concentrates it."""
    from megreader_tpu.ops.image import rectify_quads_mxu
    from megreader_tpu.ops.ccl import regions_to_quads

    mask, _ = sine_band_mask(amp=14.0, half_h=7)
    img = jnp.asarray(mask[None, :, :, None].astype(np.float32) * 255.0)
    img3 = jnp.tile(img, (1, 1, 1, 3))
    stats, chains = _run_chains(mask, n_bands=8)

    d = jnp.zeros((1, 4))
    Ho, Wo = 32, 100

    # --- chain path (mirrors E2EPipeline rectify='chain') ---
    bq = chains_to_band_quads(chains, d)
    S = bq.shape[2]
    Wb = max(Wo // S, 8)
    slices = rectify_quads_mxu(
        img3, bq.reshape(1, 4 * S, 4, 2), (Ho, Wb), crop_hw=(48, 64),
        aspect="stretch", warp="bilinear",
    )
    stretched = (
        slices.reshape(1, 4, S, Ho, Wb, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(1, 4, Ho, S * Wb, 3)
    )
    L = chain_arc_length(chains, d)
    th = 2.0 * (jnp.mean(chains["half_h"], axis=-1) + d)
    tw = jnp.clip(jnp.round(L * Ho / jnp.maximum(th, 1.0)), 2.0, float(Wo))
    chain_crop = np.asarray(resample_width(stretched, tw, Wo))[0, 0, :, :, 0]

    # --- quad/perspective baseline ---
    quads = regions_to_quads(stats)
    quad_crop = np.asarray(
        rectify_quads_mxu(img3, quads, (Ho, Wo), aspect="preserve_h")
    )[0, 0, :, :, 0]

    w = int(np.asarray(tw)[0, 0])

    def ink_centroid_std(crop, width):
        """Std dev (rows) of the per-column ink centroid — 0 for a
        perfectly straightened band, ~the sine's amplitude otherwise."""
        ink = np.maximum(crop[:, :width], 0.0)
        colmass = ink.sum(axis=0)
        cols = colmass > 32.0
        rows = np.arange(crop.shape[0])[:, None]
        cent = (ink * rows).sum(axis=0)[cols] / colmass[cols]
        return float(cent.std())

    chain_std = ink_centroid_std(chain_crop, w)
    quad_std = ink_centroid_std(quad_crop, Wo)
    # the chain unwarp straightens the sine; the homography cannot
    assert chain_std < 1.5, (chain_std, quad_std)
    assert quad_std > 3.0, (chain_std, quad_std)


def test_band_unwarp_keeps_spine_centered_under_unclip():
    """Round-5 regression: with a LARGE unclip (the shrink-inverse d ~
    2.5x the kernel half-height, the real serving regime), band quads on a
    curve are strongly trapezoidal, and the perspective map through the
    same corners pulls content toward the longer (outer) edge — the spine
    sagged to rows 31-34 of 48 instead of ~24, garbling every chain crop
    (hard-page e2e: chain 0.015 vs perspective 0.847 before the fix). The
    ruled/bilinear map must keep a painted spine line on the output
    midline of EVERY band."""
    from megreader_tpu.ops.image import rectify_quads_mxu

    H, W = 320, 320
    img = np.zeros((H, W), np.float32)
    page = np.zeros((H, W, 3), np.float32)
    xs = np.arange(110, 200)
    for x in xs:
        yc = 200 + 14 * np.sin((x - 110) / 90 * np.pi)
        img[int(yc) - 7 : int(yc) + 7, x] = 1.0
        page[int(yc), x, :] = 255.0  # the spine line

    m = jnp.asarray(img[None] > 0.5)
    labels = connected_components(m, max_iters=32)
    stats = extract_regions(labels, m.astype(jnp.float32), max_regions=4)
    S = 8
    chains = extract_chains(labels, stats, n_bands=S)
    bq = chains_to_band_quads(chains, jnp.full((1, 4), 20.0))
    Ho, Wb = 48, 20
    sl = rectify_quads_mxu(
        jnp.asarray(page[None]), bq.reshape(1, 4 * S, 4, 2), (Ho, Wb),
        crop_hw=(48, 64), aspect="stretch", warp="bilinear",
    )
    sl = np.asarray(sl).reshape(4, S, Ho, Wb, 3)
    for s in range(1, S - 1):  # end bands are tangent-extended past the ink
        band = sl[0, s].min(axis=-1)  # white line only
        cols = band.max(axis=0) > 64.0
        assert cols.any(), f"band {s}: spine line not sampled"
        rows = band.argmax(axis=0)[cols]
        # homography sag was +7..10 rows; ruled map must stay ~centered
        assert np.all(np.abs(rows - (Ho - 1) / 2) <= 3.0), (s, rows)


def test_band_quads_uniform_arc_under_unclip():
    """Round-5 regression: with a large unclip d, the tangential end
    extension must be SPREAD over all bands (uniform arc length per band),
    not concentrated in the first/last band — the downstream unwarp
    stretches every band to the same output width, so unequal band arcs
    horizontally compress the word's first/last characters (measured:
    chain e2e 0.49 vs 0.89 perspective on mixed hard pages, end letters
    misread on nearly every short word)."""
    mask, _ = sine_band_mask()
    stats, chains = _run_chains(mask, n_bands=8)
    d = 20.0
    bq = np.asarray(chains_to_band_quads(chains, jnp.full((1, 4), d)))[0, 0]
    # band spine arc = distance between consecutive top/bottom edge
    # midpoints (corners TL TR BR BL)
    mid_left = 0.5 * (bq[:, 0] + bq[:, 3])  # (S, 2)
    mid_right = 0.5 * (bq[:, 1] + bq[:, 2])
    arcs = np.linalg.norm(mid_right - mid_left, axis=-1)
    assert arcs.std() / arcs.mean() < 0.05, arcs
    # total arc still covers the extended spine (original + 2d)
    L0 = float(np.asarray(chain_arc_length(chains))[0, 0])
    assert abs(arcs.sum() - (L0 + 2 * d)) < 0.05 * (L0 + 2 * d), (
        arcs.sum(), L0 + 2 * d,
    )
    # C0 continuity preserved through the re-sampled spine
    np.testing.assert_allclose(bq[:-1, 1], bq[1:, 0], atol=1e-3)
    np.testing.assert_allclose(bq[:-1, 2], bq[1:, 3], atol=1e-3)


def test_detect_polygons_device_and_representer():
    from megreader_tpu.postproc.detection import (
        SegDetectorRepresenter,
        detect_polygons_device,
    )

    mask, _ = sine_band_mask()
    prob = jnp.asarray(mask[None].astype(np.float32)) * 0.9
    out = detect_polygons_device(prob, box_thresh=0.5, max_regions=4, n_bands=8)
    polys = np.asarray(out["polygons"])
    assert polys.shape == (1, 4, 18, 2)
    assert np.asarray(out["valid"])[0, 0]

    rep = SegDetectorRepresenter(mode="poly", box_thresh=0.5, max_regions=4)
    res = rep.represent(prob)
    assert res[0]["polygons"].shape[0] >= 1
    assert res[0]["polygons"].shape[1] == 18


def test_e2e_pipeline_chain_mode_runs():
    import jax

    from megreader_tpu.models import CTCRecognizer
    from megreader_tpu.models.detector import SegDetector
    from megreader_tpu.pipelines import E2EPipeline

    det = SegDetector(fpn_dim=64, head_dim=16)
    rec = CTCRecognizer(num_classes=37, hidden=32, num_encoder_layers=1)
    rng = jax.random.PRNGKey(0)
    pages = jnp.asarray(
        np.random.default_rng(7).random((1, 64, 64, 3)) * 255, jnp.float32
    )
    det_vars = det.init(rng, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(rng, jnp.zeros((1, 32, 100, 3)))
    pipe = E2EPipeline(
        det, rec, max_regions=4, box_thresh=0.0, rectify="chain", n_bands=4
    )
    results = pipe.predict(det_vars, rec_vars, pages)
    assert len(results) == 1
    for item in results[0]:
        assert item["polygon"].shape == (10, 2)
        assert item["quad"].shape == (4, 2)
