"""Device ingest ops vs cv2 oracles: resize parity, rectify, normalize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megreader_tpu.ops.image import (
    augment_images,
    normalize,
    perspective_matrix_from_quad,
    rectify_quads,
    resize_bilinear,
    resize_with_aspect_pad,
    warp_bilinear,
)


def test_resize_matches_cv2_inter_linear():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.random((40, 60, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img[None]), (32, 100)))[0]
    ref = cv2.resize(img, (100, 32), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_resize_upscale_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.random((16, 20, 1)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img[None]), (32, 64)))[0, :, :, 0]
    ref = cv2.resize(img[:, :, 0], (64, 32), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_aspect_pad_resize():
    rng = np.random.default_rng(2)
    # two crops on a 64x128 canvas: (40, 60) and (20, 110)
    canvas = np.zeros((2, 64, 128, 3), np.float32)
    canvas[0, :40, :60] = rng.random((40, 60, 3))
    canvas[1, :20, :110] = rng.random((20, 110, 3))
    sizes = jnp.asarray([[40, 60], [20, 110]], jnp.int32)
    out, widths = resize_with_aspect_pad(jnp.asarray(canvas), sizes, (32, 100))
    assert out.shape == (2, 32, 100, 3)
    w0, w1 = int(widths[0]), int(widths[1])
    assert w0 == round(60 / (40 / 32))  # 48
    assert w1 == 100  # 110/(20/32)=176 -> clipped
    # padding region is zero
    assert float(jnp.abs(out[0, :, w0:]).max()) == 0.0
    # content region is non-trivial
    assert float(jnp.abs(out[0, :, :w0]).max()) > 0.1


def test_normalize():
    img = jnp.full((1, 4, 4, 3), 127.5)
    out = normalize(img)
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-3)


def test_perspective_identity():
    # Quad == output rect corners -> identity mapping.
    quad = jnp.asarray([[0.0, 0.0], [31.0, 0.0], [31.0, 15.0], [0.0, 15.0]])
    M = perspective_matrix_from_quad(quad, (16, 32))
    np.testing.assert_allclose(np.asarray(M), np.eye(3), atol=1e-4)


def test_rectify_matches_cv2_warp():
    import cv2

    rng = np.random.default_rng(3)
    img = rng.random((64, 96, 3)).astype(np.float32)
    quad = np.array([[10.0, 8.0], [70.0, 12.0], [68.0, 40.0], [8.0, 36.0]], np.float32)
    out_hw = (32, 100)
    ours = np.asarray(
        rectify_quads(jnp.asarray(img[None]), jnp.asarray(quad[None, None]), out_hw)
    )[0, 0]

    dst = np.array(
        [[0, 0], [out_hw[1] - 1, 0], [out_hw[1] - 1, out_hw[0] - 1], [0, out_hw[0] - 1]],
        np.float32,
    )
    Mcv = cv2.getPerspectiveTransform(dst, quad)  # dst->src, matching ours
    ref = cv2.warpPerspective(
        img, Mcv, (out_hw[1], out_hw[0]), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
    )
    # interior pixels (borders differ by padding policy)
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], rtol=1e-3, atol=1e-3)


def test_augment_shapes_and_determinism():
    rng = jax.random.PRNGKey(7)
    imgs = jnp.asarray(np.random.default_rng(4).random((2, 32, 100, 3)), jnp.float32)
    a1 = augment_images(rng, imgs)
    a2 = augment_images(rng, imgs)
    assert a1.shape == imgs.shape
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # same key, same aug
    a3 = augment_images(jax.random.PRNGKey(8), imgs)
    assert float(jnp.abs(a3 - a1).max()) > 1e-3


def test_fused_augment_resize():
    from megreader_tpu.ops.image import augment_resize_with_aspect_pad

    rng = np.random.default_rng(5)
    canvas = np.zeros((2, 64, 128, 3), np.float32)
    canvas[0, :40, :60] = rng.random((40, 60, 3)) * 255
    canvas[1, :20, :110] = rng.random((20, 110, 3)) * 255
    sizes = jnp.asarray([[40, 60], [20, 110]], jnp.int32)
    key = jax.random.PRNGKey(0)
    a1, w1 = augment_resize_with_aspect_pad(key, jnp.asarray(canvas), sizes, (32, 100))
    a2, w2 = augment_resize_with_aspect_pad(key, jnp.asarray(canvas), sizes, (32, 100))
    assert a1.shape == (2, 32, 100, 3)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # deterministic
    a3, _ = augment_resize_with_aspect_pad(
        jax.random.PRNGKey(1), jnp.asarray(canvas), sizes, (32, 100)
    )
    assert float(jnp.abs(a3 - a1).max()) > 1e-3  # different key, different jitter
    # zero-jitter limit equals the plain resize
    from megreader_tpu.ops.image import resize_with_aspect_pad

    plain, _ = resize_with_aspect_pad(jnp.asarray(canvas), sizes, (32, 100))
    zj, _ = augment_resize_with_aspect_pad(
        key, jnp.asarray(canvas), sizes, (32, 100),
        max_scale_jitter=0.0, max_shift=0.0, brightness=0.0, contrast=0.0,
    )
    # (out - mean) + mean round-trip costs a few ulps at 255-scale
    np.testing.assert_allclose(np.asarray(zj), np.asarray(plain), atol=2e-3)


def _rotation_oracle(img, a):
    """Direct bilinear rotation: out[p] = img[c + R(a)(p - c)], zero pad."""
    H, W, C = img.shape
    cy, cx = (H - 1) / 2, (W - 1) / 2
    out = np.zeros_like(img)
    ca, sa = np.cos(a), np.sin(a)
    for y in range(H):
        for x in range(W):
            dx, dy = x - cx, y - cy
            sxf = cx + ca * dx - sa * dy
            syf = cy + sa * dx + ca * dy
            x0, y0 = int(np.floor(sxf)), int(np.floor(syf))
            fx, fy = sxf - x0, syf - y0
            v = 0.0
            for (yy, wy) in ((y0, 1 - fy), (y0 + 1, fy)):
                for (xx, wx) in ((x0, 1 - fx), (x0 + 1, fx)):
                    if 0 <= yy < H and 0 <= xx < W:
                        v = v + wy * wx * img[yy, xx]
            out[y, x] = v
    return out


def test_rotate_crops_matches_oracle():
    from megreader_tpu.ops.image import rotate_crops

    yy, xx = np.mgrid[0:48, 0:96]
    img = np.stack(
        [np.sin(xx / 7.0) + np.cos(yy / 5.0), np.cos(xx / 11.0), np.sin((xx + yy) / 9.0)],
        -1,
    ).astype(np.float32)
    for theta in (0.15, -0.3):
        ours = np.asarray(
            rotate_crops(jnp.asarray(img[None]), jnp.asarray([theta], np.float32))
        )[0]
        ref = _rotation_oracle(img, theta)  # deskew = sample with R(+theta)
        d = np.abs(ours[8:-8, 8:-8] - ref[8:-8, 8:-8])
        assert d.mean() < 5e-3 and d.max() < 0.2  # 3-shear vs direct: tiny blur


def test_rotate_crops_deskews_measured_principal_angle():
    """End-to-end deskew semantics: measure a rotated blob's principal angle
    exactly as ops.ccl.extract_regions does (0.5*atan2(2vxy, vxx-vyy) in
    image coords), pass it to rotate_crops, and the output's residual angle
    must be ~0. (Regression: a sign flip here halved rotated-page e2e
    recall while the component-level oracle test still passed.)"""
    from megreader_tpu.ops.image import rotate_crops

    def principal_angle(m):
        ys, xs = np.nonzero(m)
        xc, yc = xs - xs.mean(), ys - ys.mean()
        return 0.5 * np.arctan2(
            2 * (xc * yc).mean(), (xc**2).mean() - (yc**2).mean()
        )

    for deg in (12.0, -17.0):
        a = np.deg2rad(deg)
        yy, xx = np.mgrid[0:64, 0:160]
        cy, cx = 31.5, 79.5
        # a thin bar along direction (cos a, sin a): |perp component| small
        u = (xx - cx) * np.cos(a) + (yy - cy) * np.sin(a)
        v = -(xx - cx) * np.sin(a) + (yy - cy) * np.cos(a)
        bar = ((np.abs(v) < 4) & (np.abs(u) < 55)).astype(np.float32)
        theta = principal_angle(bar > 0.5)
        assert abs(np.rad2deg(theta) - deg) < 1.5  # measurement sanity

        out = np.asarray(
            rotate_crops(
                jnp.asarray(np.repeat(bar[None, ..., None], 3, -1)),
                jnp.asarray([theta], np.float32),
            )
        )[0, ..., 0]
        residual = principal_angle(out > 0.5)
        assert abs(np.rad2deg(residual)) < 1.0


def test_rotate_crops_zero_angle_identity():
    from megreader_tpu.ops.image import rotate_crops

    rng = np.random.default_rng(10)
    crops = rng.random((1, 32, 64, 3)).astype(np.float32)
    out = np.asarray(rotate_crops(jnp.asarray(crops), jnp.zeros((1,), np.float32)))
    np.testing.assert_allclose(out[0], crops[0], atol=1e-5)


# ---------------------------------------------------------------------------
# MXU-path perspective rectification (round 2, VERDICT r1 #6)
# ---------------------------------------------------------------------------


def _smooth_page(rng, H=200, W=300):
    import cv2

    img = rng.random((H, W, 3)).astype(np.float32)
    return cv2.GaussianBlur(img, (0, 0), 3.0)


def test_rectify_quads_mxu_vs_cv2():
    """Two-pass scanline homography vs cv2.warpPerspective (<=1e-3 mean)."""
    import cv2

    from megreader_tpu.ops.image import perspective_matrix_from_quad, rectify_quads_mxu

    rng = np.random.default_rng(0)
    page = _smooth_page(rng)
    H, W = page.shape[:2]
    Ho, Wo = 32, 100

    quads = []
    for (cx, cy, qw, qh, rot, persp) in [
        (120, 80, 110, 30, 0.0, 0.0),
        (150, 100, 100, 28, 0.25, 0.0),
        (140, 90, 96, 30, -0.2, 0.08),
        (150, 110, 120, 32, 0.35, -0.06),
    ]:
        base = np.array(
            [[-qw / 2, -qh / 2], [qw / 2, -qh / 2], [qw / 2, qh / 2], [-qw / 2, qh / 2]],
            np.float32,
        )
        R = np.array([[np.cos(rot), -np.sin(rot)], [np.sin(rot), np.cos(rot)]], np.float32)
        q = base @ R.T
        # mild perspective: stretch the right edge vertically
        q[1, 1] -= persp * qh * 2
        q[2, 1] += persp * qh * 2
        quads.append(q + [cx, cy])
    quads = np.stack(quads)[None]  # (1, 4, 4, 2)

    got = np.asarray(
        rectify_quads_mxu(jnp.asarray(page)[None], jnp.asarray(quads), (Ho, Wo))
    )[0]

    for k in range(quads.shape[1]):
        M = np.asarray(perspective_matrix_from_quad(jnp.asarray(quads[0, k]), (Ho, Wo)))
        want = cv2.warpPerspective(
            page, M, (Wo, Ho), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
        )
        # interior comparison (border pixels differ by pad convention)
        err = np.abs(got[k][2:-2, 2:-2] - want[2:-2, 2:-2]).mean()
        assert err < 1e-3, f"quad {k}: mean err {err:.2e}"


def test_rectify_quads_mxu_preserve_h():
    from megreader_tpu.ops.image import rectify_quads_mxu

    rng = np.random.default_rng(1)
    page = _smooth_page(rng)
    q = np.array([[40, 60], [140, 60], [140, 90], [40, 90]], np.float32)[None, None]
    out = np.asarray(
        rectify_quads_mxu(jnp.asarray(page)[None], jnp.asarray(q), (32, 100),
                          aspect="preserve_h")
    )[0, 0]
    # 100x30 quad at height 32 -> valid width ~ 100*32/30 = 106 -> clipped 100
    assert np.abs(out[:, :99]).mean() > 0.05
    q2 = np.array([[40, 60], [80, 60], [80, 90], [40, 90]], np.float32)[None, None]
    out2 = np.asarray(
        rectify_quads_mxu(jnp.asarray(page)[None], jnp.asarray(q2), (32, 100),
                          aspect="preserve_h")
    )[0, 0]
    # 40x30 quad -> valid width ~ 43; columns beyond are zero-masked
    assert np.abs(out2[:, 50:]).max() == 0.0
    assert np.abs(out2[:, :40]).mean() > 0.05
