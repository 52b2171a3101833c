"""Device-side image ingest: resize / normalize / warp / crop-rectify.

The reference does all of this on CPU with OpenCV + imgaug in DataLoader
worker processes (SURVEY.md §2.6 N5/N7, §3.1) — a known input-bound risk.
Here ingest is XLA ops on device (BASELINE.json north_star: "ingest path
fuses into XLA/Pallas device-side kernels").

Core primitive: ``warp_bilinear`` — sample an image through an arbitrary
3×3 (perspective) or 2×3 (affine) transform with bilinear interpolation,
implemented as vectorized gathers. Everything else (aspect-preserving
resize-with-pad, word-crop rectification from quads, flips/rotations for
augmentation) is a matrix construction on top of it.

Pixel-center convention matches cv2.resize INTER_LINEAR:
``src = (dst + 0.5) * (src_size / dst_size) - 0.5`` — required for
transcription parity with checkpoints trained on cv2-resized crops.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _bilinear_gather(
    img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, border: str = "zero"
) -> jnp.ndarray:
    """Sample img (H, W, C) at float coords x, y (each (Ho, Wo)).

    border='zero' pads outside with 0 (warp/augment); 'clamp' replicates
    edges (cv2.resize semantics, needed for exact resize parity).
    """
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        if border == "clamp":
            return v
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        return jnp.where(inside[..., None], v, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def warp_bilinear(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_hw: Tuple[int, int],
    border: str = "zero",
) -> jnp.ndarray:
    """Batched inverse-warp: out[p] = img[M @ p] with bilinear sampling.

    images: (B, H, W, C); matrices: (B, 3, 3) mapping OUTPUT (x, y, 1)
    homogeneous coords to INPUT coords; out_hw: static (Ho, Wo).
    """
    Ho, Wo = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1)

    def one(img, M):
        # Coordinate math as explicit FMAs on the VPU — a (..,3)@(3,3) dot
        # would be routed through the matmul unit at bf16-ish precision,
        # which visibly shifts sample positions (~1e-2 px is already wrong).
        w = M[2, 0] * xs + M[2, 1] * ys + M[2, 2]
        w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        sx = (M[0, 0] * xs + M[0, 1] * ys + M[0, 2]) / w
        sy = (M[1, 0] * xs + M[1, 1] * ys + M[1, 2]) / w
        return _bilinear_gather(img, sx, sy, border=border)

    return jax.vmap(one)(images, matrices)


def resize_matrix(src_hw, dst_hw) -> jnp.ndarray:
    """3×3 matrix mapping dst pixel coords -> src coords, cv2 convention."""
    sh, sw = src_hw
    dh, dw = dst_hw
    sx = sw / dw
    sy = sh / dh
    return jnp.array(
        [[sx, 0.0, 0.5 * sx - 0.5], [0.0, sy, 0.5 * sy - 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


@partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(images: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible batched resize to a static size.

    Separable matmul resampling (see resize_with_aspect_pad) — MXU-fast.
    """
    B, Hi, Wi, C = images.shape
    Ho, Wo = out_hw
    sy, sx = Hi / Ho, Wi / Wo
    oy = jax.lax.broadcasted_iota(jnp.float32, (B, Ho), 1)
    ox = jax.lax.broadcasted_iota(jnp.float32, (B, Wo), 1)
    full_h = jnp.full((B,), Hi, jnp.int32)
    full_w = jnp.full((B,), Wi, jnp.int32)
    Wy = _axis_resize_weights((oy + 0.5) * sy - 0.5, Hi, full_h)
    Wx = _axis_resize_weights((ox + 0.5) * sx - 0.5, Wi, full_w)
    tmp = jnp.einsum("boi,biwc->bowc", Wy, images, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bpw,bowc->bopc", Wx, tmp, precision=jax.lax.Precision.HIGHEST)


def _axis_resize_weights(
    src_coord: jnp.ndarray, n_in: int, valid_in: jnp.ndarray
) -> jnp.ndarray:
    """Dense bilinear resampling matrix W (B, n_out, n_in).

    W[b, o, i] = bilinear weight of input pixel i for output coordinate
    src_coord[b, o] (cv2 pixel-center convention, border clamp to the valid
    region [0, valid_in[b]-1]). The tent function relu(1 - |s - i|) IS the
    bilinear kernel, so the whole resize becomes a small matmul — gathers
    are slow on TPU, the MXU is not.
    """
    B, n_out = src_coord.shape
    s = jnp.clip(
        src_coord, 0.0, jnp.maximum(valid_in.astype(jnp.float32)[:, None] - 1.0, 0.0)
    )
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, n_in), 2)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(s[:, :, None] - idx))  # (B, n_out, n_in)
    # Rows at clamped coordinates sum to 1 automatically (weight 1 on edge).
    return w


@partial(jax.jit, static_argnames=("out_hw",))
def resize_with_aspect_pad(
    images: jnp.ndarray,
    sizes: jnp.ndarray,
    out_hw: Tuple[int, int],
    jitter: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aspect-preserving resize of per-image valid regions onto a canvas.

    images: (B, H, W, C) canvases whose top-left (sizes[b] = (h, w)) region
    holds the real pixels (host decodes variable-size images into a fixed
    canvas; device does the rest — the recognition 32×100 path).

    Implemented as two batched matmuls (height then width resampling) with
    per-image bilinear weight matrices — the MXU path. A gather-based warp
    of the same batch is ~20x slower on TPU (measured on v5e).

    Returns (out (B, Ho, Wo, C), widths (B,) valid output widths).
    """
    B, Hi, Wi, C = images.shape
    Ho, Wo = out_hw
    h = sizes[:, 0].astype(jnp.float32)
    w = sizes[:, 1].astype(jnp.float32)
    scale = h / Ho  # fit height exactly (reference recognition convention)
    out_w = jnp.minimum(jnp.round(w / scale), Wo)  # may truncate very wide
    sx = w / jnp.maximum(out_w, 1.0)
    sy = scale

    oy = jax.lax.broadcasted_iota(jnp.float32, (B, Ho), 1)
    ox = jax.lax.broadcasted_iota(jnp.float32, (B, Wo), 1)
    src_y = (oy + 0.5) * sy[:, None] - 0.5
    src_x = (ox + 0.5) * sx[:, None] - 0.5
    if jitter is not None:
        # Train-time geometric augmentation folded into the resampling
        # matrices: per-image scale (B, 2) and shift-in-src-pixels (B, 2),
        # axes (y, x). Costs nothing extra — the TPU-native way to jitter.
        jscale, jshift = jitter
        cy = (h - 1.0) / 2.0
        cx_ = (w - 1.0) / 2.0
        src_y = (src_y - cy[:, None]) * jscale[:, 0:1] + cy[:, None] + jshift[:, 0:1]
        src_x = (src_x - cx_[:, None]) * jscale[:, 1:2] + cx_[:, None] + jshift[:, 1:2]
    Wy = _axis_resize_weights(src_y, Hi, sizes[:, 0])  # (B, Ho, Hi)
    Wx = _axis_resize_weights(src_x, Wi, sizes[:, 1])  # (B, Wo, Wi)

    # height: (B,Ho,Hi) x (B,Hi,Wi*C); width: (B,Ho*C?,..) — keep einsum,
    # XLA lowers both to batched MXU matmuls. HIGHEST precision: resize is
    # parity-critical (cv2 bit-level agreement at f32).
    tmp = jnp.einsum("boi,biwc->bowc", Wy, images, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bpw,bowc->bopc", Wx, tmp, precision=jax.lax.Precision.HIGHEST)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, Ho, Wo), 2)
    valid = col < out_w[:, None, None].astype(jnp.int32)
    return out * valid[..., None], out_w.astype(jnp.int32)


def normalize(
    images: jnp.ndarray,
    mean: Tuple[float, ...] = IMAGENET_MEAN,
    std: Tuple[float, ...] = IMAGENET_STD,
    scale: float = 1.0 / 255.0,
) -> jnp.ndarray:
    """(x * scale - mean) / std, channels-last."""
    m = jnp.asarray(mean, images.dtype)
    s = jnp.asarray(std, images.dtype)
    return (images * scale - m) / s


def perspective_matrix_from_quad(quad: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Homography mapping output-rect coords -> input quad coords.

    quad: (4, 2) corners (x, y) ordered TL, TR, BR, BL. Solves the standard
    8-unknown DLT system on device (replaces cv2.getPerspectiveTransform).
    """
    Ho, Wo = out_hw
    dst = jnp.array(
        [[0.0, 0.0], [Wo - 1.0, 0.0], [Wo - 1.0, Ho - 1.0], [0.0, Ho - 1.0]],
        jnp.float32,
    )
    src = quad.astype(jnp.float32)

    # For each correspondence (X: dst -> x: src): two rows of the DLT system.
    def rows(d, s):
        X, Y = d
        x, y = s
        return jnp.array(
            [
                [X, Y, 1, 0, 0, 0, -x * X, -x * Y],
                [0, 0, 0, X, Y, 1, -y * X, -y * Y],
            ],
            jnp.float32,
        ), jnp.array([x, y], jnp.float32)

    A_rows, b_rows = jax.vmap(rows)(dst, src)
    A = A_rows.reshape(8, 8)
    b = b_rows.reshape(8)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,), jnp.float32)]).reshape(3, 3)


@partial(jax.jit, static_argnames=("out_hw",))
def rectify_quads(
    images: jnp.ndarray, quads: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Crop+rectify word quads to fixed crops (the detect->recognize bridge).

    images: (B, H, W, C); quads: (B, K, 4, 2) in image coords (TL TR BR BL);
    returns (B, K, Ho, Wo, C). Replaces cv2.warpPerspective in the e2e
    pipeline (SURVEY.md §3.3 / config #5).
    """
    B, K = quads.shape[:2]

    def per_image(img, qs):
        Ms = jax.vmap(lambda q: perspective_matrix_from_quad(q, out_hw))(qs)
        return jax.vmap(lambda M: warp_bilinear(img[None], M[None], out_hw)[0])(Ms)

    return jax.vmap(per_image)(images, quads)


def _perspective_two_pass(crops: jnp.ndarray, Hmats: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Exact-homography rectification of small crops, gather-free.

    crops: (K, Hc, Wc, C); Hmats: (K, 3, 3) mapping OUTPUT rect coords
    (x, y, 1) -> crop coords (u, v); returns (K, Ho, Wo, C).

    Catmull-Smith two-pass scanline decomposition: a homography factors
    into a vertical resample (per output row y and crop column j, sample
    crop row v*(y, j)) followed by a horizontal resample (sample tmp column
    u(x, y)), where v* solves the row equation u(x, y) = j for x. Each pass
    is a tent-weight contraction — batched MXU matmuls, zero gathers (the
    TPU replacement for cv2.warpPerspective, SURVEY.md §2.6 N5). The
    factorization is exact at tent centers (v*(y, u(x,y)) == v(x,y)); the
    sub-pixel error within the 1-px tent support is O(dv*/dj), negligible
    for text-crop homographies (oracle-tested <=1e-3 mean vs cv2).
    """
    K, Hc, Wc, C = crops.shape
    Ho, Wo = out_hw
    a, b, c = Hmats[:, 0, 0], Hmats[:, 0, 1], Hmats[:, 0, 2]
    d, e, f = Hmats[:, 1, 0], Hmats[:, 1, 1], Hmats[:, 1, 2]
    g, h = Hmats[:, 2, 0], Hmats[:, 2, 1]
    w1 = Hmats[:, 2, 2]

    ys = jax.lax.broadcasted_iota(jnp.float32, (K, Ho, 1), 1)  # output rows
    js = jax.lax.broadcasted_iota(jnp.float32, (K, 1, Wc), 2)  # crop cols

    def bc(t):  # (K,) -> (K, 1, 1)
        return t[:, None, None]

    # Solve u(x, y) = j for x:  x = (j*(h y + w1) - b y - c) / (a - j g)
    denom = bc(a) - js * bc(g)
    denom = jnp.where(jnp.abs(denom) < 1e-6, jnp.sign(denom) * 1e-6 + 1e-12, denom)
    x_at = (js * (bc(h) * ys + bc(w1)) - bc(b) * ys - bc(c)) / denom  # (K,Ho,Wc)
    wdiv = bc(g) * x_at + bc(h) * ys + bc(w1)
    wdiv = jnp.where(jnp.abs(wdiv) < 1e-8, 1e-8, wdiv)
    v_star = (bc(d) * x_at + bc(e) * ys + bc(f)) / wdiv  # (K, Ho, Wc)

    iy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, Hc), 3)
    v_cl = jnp.clip(v_star, 0.0, Hc - 1.0)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_cl[..., None] - iy))  # (K,Ho,Wc,Hc)
    tmp = jnp.einsum("kowi,kiwc->kowc", Wy, crops)  # (K, Ho, Wc, C)

    xs = jax.lax.broadcasted_iota(jnp.float32, (K, Ho, Wo), 2)
    yo = jax.lax.broadcasted_iota(jnp.float32, (K, Ho, Wo), 1)
    wdiv2 = bc(g) * xs + bc(h) * yo + bc(w1)
    wdiv2 = jnp.where(jnp.abs(wdiv2) < 1e-8, 1e-8, wdiv2)
    u = (bc(a) * xs + bc(b) * yo + bc(c)) / wdiv2  # (K, Ho, Wo)
    v_full = (bc(d) * xs + bc(e) * yo + bc(f)) / wdiv2
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, Wc), 3)
    u_cl = jnp.clip(u, 0.0, Wc - 1.0)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(u_cl[..., None] - ix))  # (K,Ho,Wo,Wc)
    out = jnp.einsum("koxj,kojc->koxc", Wx, tmp)

    # zero outside the crop (cv2 BORDER_CONSTANT semantics)
    inside = (
        (u >= -0.5) & (u <= Wc - 0.5) & (v_full >= -0.5) & (v_full <= Hc - 0.5)
    )
    return out * inside[..., None]


def _bilinear_two_pass(crops: jnp.ndarray, qcs: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Ruled-surface (bilinear patch) rectification of small crops.

    crops: (K, Hc, Wc, C); qcs: (K, 4, 2) corners TL TR BR BL in crop
    coords; returns (K, Ho, Wo, C). Output pixel (x, y) samples the patch
    P(X, Y) = TL(1-X)(1-Y) + TR X(1-Y) + BL(1-X)Y + BR XY with
    X = x/(Wo-1), Y = y/(Ho-1) — corners to corners, edges linearly.

    Why this exists next to ``_perspective_two_pass``: a homography
    through the same 4 corners does NOT take edge midpoints to edge
    midpoints. Curved-text band quads are strongly trapezoidal (the outer
    edge of a curved band is ~2x the inner edge once half-height includes
    the shrink-inverse unclip), and the projective map pulls content
    toward the longer edge — measured ~7 rows of spine sag out of 48 at
    curvature radius ~2x text height, which garbled every chain-mode crop
    (round-5 hard-page eval: chain 0.015 vs perspective 0.847 e2e recall).
    The bilinear map keeps the spine (the chord of edge midpoints) exactly
    on the output midline and is exactly C0 across shared band edges —
    adjacent bands map the shared edge by the same linear interpolation.
    Same two-pass tent-contraction structure (batched MXU matmuls, zero
    gathers): pass 1 solves u(X, Y) = j for X — u is linear in X at fixed
    Y, so X = (j - a0 - a2 Y)/(a1 + a3 Y), the same ratio-of-linears shape
    the homography pass solves.
    """
    K, Hc, Wc, C = crops.shape
    Ho, Wo = out_hw
    TL, TR, BR, BL = qcs[:, 0], qcs[:, 1], qcs[:, 2], qcs[:, 3]
    a = jnp.stack([TL, TR - TL, BL - TL, TL - TR - BL + BR], axis=1)  # (K,4,2)
    au, av = a[..., 0], a[..., 1]  # (K, 4) coeffs: 1, X, Y, XY

    def bc(t):  # (K,) -> (K, 1, 1)
        return t[:, None, None]

    ys = jax.lax.broadcasted_iota(jnp.float32, (K, Ho, 1), 1)
    Y = ys / max(Ho - 1, 1)
    js = jax.lax.broadcasted_iota(jnp.float32, (K, 1, Wc), 2)

    denom = bc(au[:, 1]) + bc(au[:, 3]) * Y  # du/dX at this Y
    denom = jnp.where(jnp.abs(denom) < 1e-6, jnp.sign(denom) * 1e-6 + 1e-12, denom)
    X_at = (js - bc(au[:, 0]) - bc(au[:, 2]) * Y) / denom  # (K, Ho, Wc)
    v_star = (
        bc(av[:, 0]) + bc(av[:, 1]) * X_at + bc(av[:, 2]) * Y
        + bc(av[:, 3]) * X_at * Y
    )
    iy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, Hc), 3)
    v_cl = jnp.clip(v_star, 0.0, Hc - 1.0)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_cl[..., None] - iy))
    tmp = jnp.einsum("kowi,kiwc->kowc", Wy, crops)  # (K, Ho, Wc, C)

    xs = jax.lax.broadcasted_iota(jnp.float32, (K, Ho, Wo), 2)
    X = xs / max(Wo - 1, 1)
    yo = jax.lax.broadcasted_iota(jnp.float32, (K, Ho, Wo), 1)
    Yo = yo / max(Ho - 1, 1)
    u = bc(au[:, 0]) + bc(au[:, 1]) * X + bc(au[:, 2]) * Yo + bc(au[:, 3]) * X * Yo
    v_full = (
        bc(av[:, 0]) + bc(av[:, 1]) * X + bc(av[:, 2]) * Yo + bc(av[:, 3]) * X * Yo
    )
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, Wc), 3)
    u_cl = jnp.clip(u, 0.0, Wc - 1.0)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(u_cl[..., None] - ix))
    out = jnp.einsum("koxj,kojc->koxc", Wx, tmp)

    inside = (
        (u >= -0.5) & (u <= Wc - 0.5) & (v_full >= -0.5) & (v_full <= Hc - 0.5)
    )
    return out * inside[..., None]


def perspective_matrix_from_quad_w(
    quad: jnp.ndarray, out_h: int, out_w
) -> jnp.ndarray:
    """Like ``perspective_matrix_from_quad`` but with a (traced) target
    width — used for aspect-preserving rectification where each quad maps
    onto [0, w_k-1] x [0, Ho-1] of the fixed canvas."""
    dst = jnp.stack(
        [
            jnp.stack([jnp.float32(0.0), jnp.float32(0.0)]),
            jnp.stack([out_w - 1.0, jnp.float32(0.0)]),
            jnp.stack([out_w - 1.0, jnp.float32(out_h - 1.0)]),
            jnp.stack([jnp.float32(0.0), jnp.float32(out_h - 1.0)]),
        ]
    )
    src = quad.astype(jnp.float32)

    def rows(d, s):
        X, Y = d
        x, y = s
        return jnp.stack(
            [
                jnp.stack([X, Y, 1.0, 0.0, 0.0, 0.0, -x * X, -x * Y]),
                jnp.stack([0.0, 0.0, 0.0, X, Y, 1.0, -y * X, -y * Y]),
            ]
        ), jnp.stack([x, y])

    A_rows, b_rows = jax.vmap(rows)(dst, src)
    h = jnp.linalg.solve(A_rows.reshape(8, 8), b_rows.reshape(8))
    return jnp.concatenate([h, jnp.ones((1,), jnp.float32)]).reshape(3, 3)


@partial(
    jax.jit, static_argnames=("out_hw", "crop_hw", "chunk", "aspect", "warp")
)
def rectify_quads_mxu(
    images: jnp.ndarray,
    quads: jnp.ndarray,
    out_hw: Tuple[int, int],
    crop_hw: Tuple[int, int] = (48, 160),
    chunk: int = 32,
    aspect: str = "stretch",
    warp: str = "perspective",
) -> jnp.ndarray:
    """Perspective-rectify word quads on the MXU path (no gathers).

    images: (B, H, W, C) pages; quads: (B, K, 4, 2) corners TL TR BR BL in
    page coords; returns (B, K, Ho, Wo, C). Replaces the gather-based
    ``rectify_quads`` in the e2e hot path (VERDICT r1 #6):

    1. axis-aligned bbox crop of each quad to a (Hc, Wc) canvas via the
       separable-matmul ``crop_resize_boxes`` (tracks the affine map),
    2. residual homography (output rect -> crop coords) solved per quad,
    3. exact two-pass scanline warp (``_perspective_two_pass``).

    ``lax.map`` over chunks of crops bounds the (chunk, Ho, Wc, Hc) tent
    tensors (~8 MB at defaults).

    ``warp``: 'perspective' (default — exact homography, word quads) or
    'bilinear' (ruled surface through the same corners — REQUIRED for
    curved-text band quads, where the trapezoid homography sags the spine
    toward the longer edge; see ``_bilinear_two_pass``).
    """
    B, K = quads.shape[:2]
    H, W = images.shape[1], images.shape[2]
    Hc, Wc = crop_hw

    m = 2.0
    x0 = jnp.clip(jnp.min(quads[..., 0], axis=-1) - m, 0, W - 1)
    x1 = jnp.clip(jnp.max(quads[..., 0], axis=-1) + m, 1, W)
    y0 = jnp.clip(jnp.min(quads[..., 1], axis=-1) - m, 0, H - 1)
    y1 = jnp.clip(jnp.max(quads[..., 1], axis=-1) + m, 1, H)
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    crops = crop_resize_boxes(images, boxes, (Hc, Wc), aspect="stretch")

    # quad corners in crop pixel coords (invert the crop_resize_boxes map:
    # page p = box0 + (pc + 0.5) * s - 0.5  =>  pc = (p - box0 + 0.5)/s - 0.5)
    sx = (x1 - x0) / Wc
    sy = (y1 - y0) / Hc
    qc_x = (quads[..., 0] - x0[..., None] + 0.5) / sx[..., None] - 0.5
    qc_y = (quads[..., 1] - y0[..., None] + 0.5) / sy[..., None] - 0.5
    qc = jnp.stack([qc_x, qc_y], axis=-1).reshape(B * K, 4, 2)

    Ho, Wo = out_hw
    flat = crops.reshape(B * K, Hc, Wc, crops.shape[-1])
    n = B * K
    pad = (-n) % chunk

    if warp == "bilinear":
        # ruled-surface band unwarp (chain mode): midpoint-preserving, C0
        # across shared band edges — see _bilinear_two_pass
        if aspect == "preserve_h":
            raise ValueError("warp='bilinear' supports aspect='stretch' only")
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
            unit = jnp.asarray(
                [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], jnp.float32
            )
            qc = jnp.concatenate([qc, jnp.tile(unit[None], (pad, 1, 1))], axis=0)
        flat = flat.reshape(-1, chunk, Hc, Wc, crops.shape[-1])
        qcs = qc.reshape(-1, chunk, 4, 2)
        out = jax.lax.map(
            lambda args: _bilinear_two_pass(args[0], args[1], out_hw),
            (flat, qcs),
        )
        out = out.reshape(-1, *out.shape[2:])[: B * K]
        return out.reshape(B, K, Ho, Wo, crops.shape[-1])

    if aspect == "preserve_h":
        # Per-quad target width from quad geometry (mean edge lengths) so
        # crops stay undistorted and left-aligned like training crops.
        top = jnp.linalg.norm(quads[..., 1, :] - quads[..., 0, :], axis=-1)
        bot = jnp.linalg.norm(quads[..., 2, :] - quads[..., 3, :], axis=-1)
        left = jnp.linalg.norm(quads[..., 3, :] - quads[..., 0, :], axis=-1)
        right = jnp.linalg.norm(quads[..., 2, :] - quads[..., 1, :], axis=-1)
        qw = 0.5 * (top + bot)
        qh = jnp.maximum(0.5 * (left + right), 1.0)
        out_w = jnp.clip(jnp.round(qw * Ho / qh), 2.0, float(Wo)).reshape(B * K)
        Hmats = jax.vmap(
            lambda q, w: perspective_matrix_from_quad_w(q, Ho, w)
        )(qc, out_w)
    else:
        out_w = jnp.full((B * K,), float(Wo))
        Hmats = jax.vmap(lambda q: perspective_matrix_from_quad(q, out_hw))(qc)

    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
        Hmats = jnp.concatenate(
            [Hmats, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))], axis=0
        )
    flat = flat.reshape(-1, chunk, Hc, Wc, crops.shape[-1])
    Hmats = Hmats.reshape(-1, chunk, 3, 3)
    out = jax.lax.map(
        lambda args: _perspective_two_pass(args[0], args[1], out_hw), (flat, Hmats)
    )
    out = out.reshape(-1, *out.shape[2:])[: B * K]
    if aspect == "preserve_h":
        col = jax.lax.broadcasted_iota(jnp.float32, (B * K, 1, Wo, 1), 2)
        out = out * (col < out_w[:, None, None, None])
    return out.reshape(B, K, Ho, Wo, crops.shape[-1])


@partial(jax.jit, static_argnames=("out_hw", "aspect"))
def crop_resize_boxes(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int],
    aspect: str = "stretch",
) -> jnp.ndarray:
    """Batched axis-aligned crop + resize: the detect->recognize bridge.

    images: (B, H, W, C) pages; boxes: (B, K, 4) as (x0, y0, x1, y1) in
    pixels; returns (B, K, Ho, Wo, C).

    Separable per-crop bilinear weight matrices -> two batched matmuls on
    the MXU (same trick as resize_with_aspect_pad; a gather warp here costs
    ~20x more on TPU). Exact perspective rectification for rotated quads:
    ``rectify_quads_mxu`` (two-pass scanline, also gather-free).
    """
    B, Hi, Wi, C = images.shape
    K = boxes.shape[1]
    Ho, Wo = out_hw
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    sh = (y1 - y0) / Ho
    if aspect == "stretch":
        sw = (x1 - x0) / Wo  # (B, K)
    elif aspect == "preserve_h":
        # Same scale on both axes (height fits exactly) — word crops stay
        # undistorted and left-aligned with zero padding, matching the
        # recognizer's training-time resize_with_aspect_pad distribution.
        sw = sh
    else:
        raise ValueError(f"unknown aspect mode {aspect!r}")

    oy = jax.lax.broadcasted_iota(jnp.float32, (B, K, Ho), 2)
    ox = jax.lax.broadcasted_iota(jnp.float32, (B, K, Wo), 2)
    src_y = y0[..., None] + (oy + 0.5) * sh[..., None] - 0.5
    src_x = x0[..., None] + (ox + 0.5) * sw[..., None] - 0.5

    iy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, Hi), 3)
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, Wi), 3)
    sy = jnp.clip(src_y, 0.0, Hi - 1.0)
    sx = jnp.clip(src_x, 0.0, Wi - 1.0)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - iy))  # (B,K,Ho,Hi)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - ix))  # (B,K,Wo,Wi)

    tmp = jnp.einsum("bkoi,biwc->bkowc", Wy, images)
    out = jnp.einsum("bkpw,bkowc->bkopc", Wx, tmp)
    if aspect == "preserve_h":
        out_w = (x1 - x0) / jnp.maximum(sw, 1e-6)  # valid output columns
        col = jax.lax.broadcasted_iota(jnp.float32, (B, K, 1, Wo, 1), 3)
        out = out * (col < out_w[:, :, None, None, None])
    return out


def _shear_x(crops: jnp.ndarray, shift_per_row: jnp.ndarray) -> jnp.ndarray:
    """out[k, y, x] = crops[k, y, x + shift_per_row[k, y]] (bilinear, zero pad).

    Per-row fractional shifts as tent-weight matmuls — no gathers.
    crops (K, H, W, C); shift_per_row (K, H).
    """
    K, H, W, C = crops.shape
    ox = jax.lax.broadcasted_iota(jnp.float32, (K, H, W), 2)
    src = ox + shift_per_row[:, :, None]  # (K, H, W)
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, W), 3)
    wmat = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - ix))  # (K,H,Wo,Wi)
    return jnp.einsum("khoi,khic->khoc", wmat, crops)


def _shear_y(crops: jnp.ndarray, shift_per_col: jnp.ndarray) -> jnp.ndarray:
    """out[k, y, x] = crops[k, y + shift_per_col[k, x], x]."""
    K, H, W, C = crops.shape
    oy = jax.lax.broadcasted_iota(jnp.float32, (K, W, H), 2)
    src = oy + shift_per_col[:, :, None]  # (K, W, Ho)
    iy = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, H), 3)
    wmat = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - iy))  # (K,W,Ho,Hi)
    return jnp.einsum("kwoi,kiwc->kowc", wmat, crops)


@jax.jit
def rotate_crops(crops: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate each crop's content by -theta about its center (i.e. deskew a
    region whose principal axis is at +theta), gather-free.

    Classic three-shear rotation: R(θ) = Sx(-tan θ/2) Sy(sin θ) Sx(-tan θ/2),
    each shear a per-row/column 1-D bilinear resample expressed as a
    tent-weight matmul — the TPU replacement for cv2.warpAffine in the
    detect->rectify->recognize path (SURVEY.md §2.6 N5). Three bilinear
    passes cost slight extra blur vs one direct warp; angles are small for
    text so the compounding is negligible.

    crops (K, H, W, C); theta (K,) radians.
    """
    K, H, W, C = crops.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    # Deskew samples with R(+theta): walking the output x-axis follows the
    # region's principal direction (cos t, sin t) in image coords. (A -theta
    # here anti-deskews — regression caught by the e2e rotated-page eval.)
    a = theta
    t_half = jnp.tan(a / 2.0)
    s = jnp.sin(a)
    y_rel = jax.lax.broadcasted_iota(jnp.float32, (K, H), 1) - cy
    x_rel = jax.lax.broadcasted_iota(jnp.float32, (K, W), 1) - cx

    out = _shear_x(crops, -t_half[:, None] * y_rel)
    out = _shear_y(out, s[:, None] * x_rel)
    out = _shear_x(out, -t_half[:, None] * y_rel)
    return out


# ---------------------------------------------------------------------------
# On-device train-time augmentations (SURVEY.md §2.6 N7)
# ---------------------------------------------------------------------------


def augment_affine_matrix(
    rng: jax.Array,
    batch: int,
    max_rotate: float = 10.0,
    max_scale: float = 0.2,
    max_shift: float = 0.05,
    center_hw: Tuple[float, float] = (16.0, 50.0),
) -> jnp.ndarray:
    """Random inverse-affine matrices (B, 3, 3) around the image center."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    ang = jax.random.uniform(k1, (batch,), minval=-max_rotate, maxval=max_rotate)
    ang = ang * (jnp.pi / 180.0)
    sc = 1.0 + jax.random.uniform(k2, (batch,), minval=-max_scale, maxval=max_scale)
    tx = jax.random.uniform(k3, (batch,), minval=-max_shift, maxval=max_shift)
    ty = jax.random.uniform(k4, (batch,), minval=-max_shift, maxval=max_shift)
    cy, cx = center_hw
    cos, sin = jnp.cos(ang) / sc, jnp.sin(ang) / sc
    tx = tx * 2 * cx
    ty = ty * 2 * cy
    # inverse transform: rotate/scale about center then shift
    a = cos
    b = sin
    M = jnp.stack(
        [
            jnp.stack([a, b, cx - a * cx - b * cy + tx], axis=-1),
            jnp.stack([-b, a, cy + b * cx - a * cy + ty], axis=-1),
            jnp.stack([jnp.zeros_like(a), jnp.zeros_like(a), jnp.ones_like(a)], axis=-1),
        ],
        axis=1,
    )
    return M


@partial(jax.jit, static_argnames=("out_hw",))
def augment_resize_with_aspect_pad(
    rng: jax.Array,
    images: jnp.ndarray,
    sizes: jnp.ndarray,
    out_hw: Tuple[int, int],
    max_scale_jitter: float = 0.12,
    max_shift: float = 1.5,
    brightness: float = 0.15,
    contrast: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ingest + augmentation for recognition training: the geometric
    jitter rides the separable resize matrices (zero extra compute vs the
    plain resize — a gather-warp augment costs ~20x the whole model fwd),
    photometric jitter is elementwise after.
    """
    B = images.shape[0]
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    jscale = 1.0 + jax.random.uniform(
        k1, (B, 2), minval=-max_scale_jitter, maxval=max_scale_jitter
    )
    jshift = jax.random.uniform(k2, (B, 2), minval=-max_shift, maxval=max_shift)
    out, widths = resize_with_aspect_pad(images, sizes, out_hw, jitter=(jscale, jshift))
    br = jax.random.uniform(k3, (B, 1, 1, 1), minval=-brightness, maxval=brightness) * 255.0
    ct = 1.0 + jax.random.uniform(k4, (B, 1, 1, 1), minval=-contrast, maxval=contrast)
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    return (out - mean) * ct + mean + br, widths


@partial(jax.jit, static_argnames=("out_hw",))
def augment_images(
    rng: jax.Array,
    images: jnp.ndarray,
    out_hw: Optional[Tuple[int, int]] = None,
    brightness: float = 0.2,
    contrast: float = 0.2,
    max_rotate: float = 8.0,
) -> jnp.ndarray:
    """Geometric + photometric train-time augmentation, fully on device."""
    B, H, W, C = images.shape
    out_hw = out_hw or (H, W)
    k1, k2, k3 = jax.random.split(rng, 3)
    M = augment_affine_matrix(k1, B, max_rotate=max_rotate, center_hw=(H / 2, W / 2))
    out = warp_bilinear(images, M, out_hw)
    br = jax.random.uniform(k2, (B, 1, 1, 1), minval=-brightness, maxval=brightness)
    ct = 1.0 + jax.random.uniform(k3, (B, 1, 1, 1), minval=-contrast, maxval=contrast)
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    return (out - mean) * ct + mean + br
