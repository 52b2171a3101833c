"""Chain (polygon) extraction for curved text regions — device-side.

The reference's representer emits either min-area quads or contour-approx
*polygons* (SURVEY.md §2.5 "polygon (contour approx) or min-area quad");
round 1-4 only built the quad mode, so CUTE80-style curved words detected
on a page got a quad + one homography that cannot straighten them
(VERDICT r4 missing #2). This module is the TPU-native polygon mode:

1. ``extract_chains``: for each connected component, slice the region into
   S uniform bands along its principal axis (the u coordinate already used
   for rotated extents in ``ops/ccl._region_stats_single``) and reduce each
   band's perpendicular (v) pixel distribution to a center + half-height.
   Band boundaries become a *spine* polyline of S+1 points with local
   half-heights and normals — a pure sequence of (K, N) comparisons and
   masked reductions, no gathers, ``lax.map`` over the batch.
2. ``chains_to_band_quads``: the S per-band quads (shared boundary edges,
   so the piecewise unwarp is C0-continuous) for ``rectify_quads_mxu``.
3. ``chains_to_polygons``: top chain + reversed bottom chain as a
   (2(S+1), 2) polygon — the detection output mode for curved text.

Straight words degrade gracefully: every band sees the same v
distribution, the spine is a straight line, and the band quads tile the
min-area rectangle — so chain mode is safe as the *only* mode.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from .ccl import _candidate_roots_single


def _chains_single(
    labels: jnp.ndarray, stats: Dict[str, jnp.ndarray], n_bands: int
) -> Dict[str, jnp.ndarray]:
    """Per-image chain extraction. labels (H, W); stats rows (K, ...) from
    ``extract_regions`` for THIS image. Returns (K, S+1, ...) chain arrays.

    Region->slot alignment: slots are re-derived with the same
    ``_candidate_roots_single`` used by every extract impl (XLA and the
    Pallas path's 'xla' candidate phase), so row k here is row k of stats.
    """
    H, W = labels.shape
    S = n_bands
    K = stats["center"].shape[0]
    flat_lbl = labels.reshape(-1)
    valid = flat_lbl >= 0
    _, top_root, _ = _candidate_roots_single(labels, K)
    mask = (flat_lbl[None, :] == top_root[:, None]) & valid[None, :]  # (K, N)

    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1).astype(jnp.float32)
    cx = stats["center"][:, 0]
    cy = stats["center"][:, 1]
    theta = stats["theta"]
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    dx = xs[None, :] - cx[:, None]
    dy = ys[None, :] - cy[:, None]
    u = dx * cos_t[:, None] + dy * sin_t[:, None]  # (K, N)
    v = -dx * sin_t[:, None] + dy * cos_t[:, None]

    u0 = stats["extent_u"][:, 0]
    u1 = stats["extent_u"][:, 1]
    width = jnp.maximum(u1 - u0, 1e-3)
    band = jnp.clip(
        jnp.floor((u - u0[:, None]) / width[:, None] * S), 0, S - 1
    )  # (K, N) float band index

    big = jnp.float32(1e9)
    centers, halfs, alive = [], [], []
    for s in range(S):
        bm = mask & (band == s)
        cnt = jnp.sum(bm, axis=1).astype(jnp.float32)
        v_lo = jnp.min(jnp.where(bm, v, big), axis=1)
        v_hi = jnp.max(jnp.where(bm, v, -big), axis=1)
        ok = cnt > 0
        centers.append(jnp.where(ok, 0.5 * (v_lo + v_hi), 0.0))
        halfs.append(jnp.where(ok, 0.5 * (v_hi - v_lo), 0.0))
        alive.append(ok)
    c = jnp.stack(centers, axis=1)  # (K, S)
    h = jnp.stack(halfs, axis=1)
    ok = jnp.stack(alive, axis=1)

    # Empty bands (component concave along u / merged distractors): fall
    # back to the v-centroid (0 by construction) and the mean live
    # half-height, so downstream geometry stays finite.
    n_ok = jnp.maximum(jnp.sum(ok, axis=1), 1)
    h_mean = jnp.sum(h * ok, axis=1) / n_ok
    h = jnp.where(ok, h, h_mean[:, None])

    # De-inflate: a band's raw v extent includes the spine's drift WITHIN
    # the band (first-order: |dc/du| * band_width / 2), so a sloped segment
    # of a constant-thickness curve reads too tall. Estimate the local
    # slope from neighboring band centers (central differences, one-sided
    # at the ends) and subtract the drift term.
    bw = width / S  # (K,) band width in u
    if S >= 2:
        dc = c[:, 1:] - c[:, :-1]  # (K, S-1)
        slope = jnp.concatenate(
            [dc[:, :1], 0.5 * (dc[:, :-1] + dc[:, 1:]), dc[:, -1:]], axis=1
        ) / bw[:, None]  # (K, S)
        h = jnp.maximum(h - jnp.abs(slope) * bw[:, None] * 0.5, 0.5)

    # Band stats -> boundary values: interior boundary i averages bands
    # i-1/i; the two ends extrapolate linearly (curved words keep curving
    # through their endpoints — clamping flattens them). NOTE a global
    # quadratic spine fit was A/B'd here twice (round 5) and LOST both
    # ways on 96-page curved sets: full-fit spine (parabola bias beats
    # raw band noise, curved 2D-CTC e2e 0.318 -> worse) and fit-at-ends
    # (0.318 -> 0.264) — the synthetic curves are not parabolas, and
    # biased end extrapolation garbles the unclip-extension region where
    # the first/last characters live. Local estimates stay.
    def to_boundaries(a):  # (K, S) -> (K, S+1)
        inner = 0.5 * (a[:, :-1] + a[:, 1:])
        if S >= 2:
            first = 1.5 * a[:, :1] - 0.5 * a[:, 1:2]
            last = 1.5 * a[:, -1:] - 0.5 * a[:, -2:-1]
        else:
            first, last = a[:, :1], a[:, -1:]
        return jnp.concatenate([first, inner, last], axis=1)

    vc = to_boundaries(c)  # (K, S+1)
    hh = jnp.maximum(to_boundaries(h), 0.5)

    ub = u0[:, None] + width[:, None] * (
        jnp.arange(S + 1, dtype=jnp.float32)[None, :] / S
    )  # (K, S+1)
    # boundary points in image coords: center + u*e_u + v*e_v
    px = cx[:, None] + ub * cos_t[:, None] - vc * sin_t[:, None]
    py = cy[:, None] + ub * sin_t[:, None] + vc * cos_t[:, None]
    pts = jnp.stack([px, py], axis=-1)  # (K, S+1, 2)

    # chain tangents (central differences, one-sided ends) -> unit normals
    d_in = pts[:, 1:] - pts[:, :-1]  # (K, S, 2)
    tang = jnp.concatenate(
        [d_in[:, :1], 0.5 * (d_in[:, :-1] + d_in[:, 1:]), d_in[:, -1:]], axis=1
    )  # (K, S+1, 2)
    tlen = jnp.maximum(jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-6)
    tang = tang / tlen
    normal = jnp.stack([-tang[..., 1], tang[..., 0]], axis=-1)  # +v side

    return {
        "points": pts,  # (K, S+1, 2) spine boundary points (x, y)
        "tangent": tang,  # (K, S+1, 2) unit tangents
        "normal": normal,  # (K, S+1, 2) unit normals (+v side)
        "half_h": hh,  # (K, S+1) local half-heights (pre-unclip)
        "band_alive": ok,  # (K, S)
    }


@partial(jax.jit, static_argnames=("n_bands",))
def extract_chains(
    labels: jnp.ndarray, stats: Dict[str, jnp.ndarray], n_bands: int = 8
) -> Dict[str, jnp.ndarray]:
    """(B, H, W) labels + batched stats -> batched chains (B, K, S+1, ...).

    ``lax.map`` over the batch keeps the (K, N) u/v planes at one-image
    footprint, same policy as ``ops/ccl.extract_regions``.
    """
    per_image_stats = {
        k: stats[k] for k in ("center", "theta", "extent_u", "extent_v")
    }
    return jax.lax.map(
        lambda args: _chains_single(args[0], args[1], n_bands),
        (labels, per_image_stats),
    )


def _resample_polyline(
    pts: jnp.ndarray, hh: jnp.ndarray, m: int
) -> tuple:
    """Re-sample a polyline (..., Q, 2) + per-point scalars (..., Q) to
    ``m`` points UNIFORM in arc length. Pure comparisons + one small
    matmul (no gathers): build the (..., m, Q) linear-interp weight matrix
    from per-target segment membership."""
    seg = jnp.maximum(
        jnp.linalg.norm(pts[..., 1:, :] - pts[..., :-1, :], axis=-1), 1e-6
    )  # (..., Q-1)
    q1 = seg.shape[-1]
    cum = jnp.concatenate(
        [jnp.zeros_like(seg[..., :1]), jnp.cumsum(seg, axis=-1)], axis=-1
    )  # (..., Q)
    total = cum[..., -1:]
    a = total * (
        jnp.arange(m, dtype=pts.dtype) / (m - 1)
    )[(None,) * (pts.ndim - 2)]  # (..., m)
    lo = cum[..., None, :-1]  # (..., 1, Q-1)
    hi = cum[..., None, 1:]
    av = a[..., :, None]  # (..., m, 1)
    inside = (av >= lo) & (av < hi)  # (..., m, Q-1)
    # the a == total endpoint falls in no half-open segment: assign it
    # (and any fp stragglers) to the last segment
    none = ~jnp.any(inside, axis=-1, keepdims=True)
    last = (
        jax.lax.broadcasted_iota(jnp.int32, inside.shape, inside.ndim - 1)
        == q1 - 1
    )
    inside = inside | (none & last)
    frac = jnp.clip((av - lo) / seg[..., None, :], 0.0, 1.0)
    w_lo = jnp.where(inside, 1.0 - frac, 0.0)  # weight on segment start
    w_hi = jnp.where(inside, frac, 0.0)  # weight on segment end
    zero = jnp.zeros_like(w_lo[..., :1])
    W = jnp.concatenate([w_lo, zero], axis=-1) + jnp.concatenate(
        [zero, w_hi], axis=-1
    )  # (..., m, Q)
    pts_u = jnp.einsum("...mq,...qc->...mc", W, pts)
    hh_u = jnp.einsum("...mq,...q->...m", W, hh)
    return pts_u, hh_u


def chains_to_band_quads(
    chains: Dict[str, jnp.ndarray], unclip_distance: jnp.ndarray = None
) -> jnp.ndarray:
    """Chains -> per-band quads (B, K, S, 4, 2), corners TL TR BR BL.

    ``unclip_distance`` (B, K): outward offset along local normals (the
    same training-shrink inverse used for quads) plus a tangential end
    extension — the chain analog of rectangle unclip.

    The extended spine is re-sampled so every band covers the SAME arc
    length (round-5 fix): the first formulation kept the original band
    boundaries and pushed only the endpoints out by ``d``, so the first
    and last bands covered ``bw + d`` of arc while inner bands covered
    ``bw`` — and the downstream piecewise unwarp stretches every band to
    the same output width, horizontally compressing the first/last
    characters 2-4x on short words (measured: every chain crop misread
    its end letters; mixed-page chain e2e 0.49 vs 0.89 perspective).
    Uniform-arc bands make the constant-width stretch metrically correct.
    """
    pts = chains["points"]  # (B, K, S+1, 2)
    hh = chains["half_h"]  # (B, K, S+1)
    tang = chains["tangent"]
    P = pts.shape[-2]
    if unclip_distance is not None:
        d = unclip_distance[..., None]  # (B, K, 1)
        # extended spine: endpoints pushed out by d along the end tangents
        pts_e = jnp.concatenate(
            [
                pts[..., :1, :] - tang[..., :1, :] * d[..., None],
                pts,
                pts[..., -1:, :] + tang[..., -1:, :] * d[..., None],
            ],
            axis=-2,
        )  # (B, K, S+3, 2)
        hh_e = (
            jnp.concatenate([hh[..., :1], hh, hh[..., -1:]], axis=-1) + d
        )
        pts, hh = _resample_polyline(pts_e, hh_e, P)
    # tangents/normals from the (re-sampled) polyline
    d_in = pts[..., 1:, :] - pts[..., :-1, :]
    tang = jnp.concatenate(
        [
            d_in[..., :1, :],
            0.5 * (d_in[..., :-1, :] + d_in[..., 1:, :]),
            d_in[..., -1:, :],
        ],
        axis=-2,
    )
    tlen = jnp.maximum(jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-6)
    tang = tang / tlen
    nrm = jnp.stack([-tang[..., 1], tang[..., 0]], axis=-1)
    top = pts - nrm * hh[..., None]  # (B, K, S+1, 2)
    bot = pts + nrm * hh[..., None]
    return jnp.stack(
        [top[..., :-1, :], top[..., 1:, :], bot[..., 1:, :], bot[..., :-1, :]],
        axis=-2,
    )  # (B, K, S, 4, 2)


def chains_to_polygons(
    chains: Dict[str, jnp.ndarray], unclip_distance: jnp.ndarray = None
) -> jnp.ndarray:
    """Chains -> closed polygons (B, K, 2(S+1), 2): top chain left->right,
    bottom chain right->left — the detection polygon output mode (reference
    SegDetectorRepresenter contour path, SURVEY.md §2.5)."""
    bq = chains_to_band_quads(chains, unclip_distance)
    top = jnp.concatenate([bq[..., :, 0, :], bq[..., -1:, 1, :]], axis=-2)
    bot = jnp.concatenate([bq[..., :, 3, :], bq[..., -1:, 2, :]], axis=-2)
    return jnp.concatenate([top, jnp.flip(bot, axis=-2)], axis=-2)


def chain_arc_length(
    chains: Dict[str, jnp.ndarray], unclip_distance: jnp.ndarray = None
) -> jnp.ndarray:
    """Total spine length (B, K), including the unclip end extensions."""
    pts = chains["points"]
    seg = jnp.linalg.norm(pts[..., 1:, :] - pts[..., :-1, :], axis=-1)
    L = jnp.sum(seg, axis=-1)
    if unclip_distance is not None:
        L = L + 2.0 * unclip_distance
    return L


def resample_width(
    crops: jnp.ndarray, target_w: jnp.ndarray, out_w: int
) -> jnp.ndarray:
    """Squeeze each (..., Ho, Wi, C) crop's full width onto [0, target_w)
    columns of a (..., Ho, out_w, C) canvas (left-aligned, zero-padded) —
    restores training-crop aspect after the stretch-mode band unwarp.
    Tent-weight matmul over width, no gathers (ops/image conventions)."""
    *lead, Ho, Wi, C = crops.shape
    flat = crops.reshape(-1, Ho, Wi, C)
    tw = jnp.maximum(target_w.reshape(-1).astype(jnp.float32), 2.0)
    N = flat.shape[0]
    ox = jax.lax.broadcasted_iota(jnp.float32, (N, out_w), 1)
    src = (ox + 0.5) * (Wi / tw)[:, None] - 0.5
    src = jnp.clip(src, 0.0, Wi - 1.0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (1, 1, Wi), 2)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - ix))  # (N, out_w, Wi)
    out = jnp.einsum("now,nhwc->nhoc", Wx, flat)
    col = jax.lax.broadcasted_iota(jnp.float32, (N, 1, out_w, 1), 2)
    out = out * (col < tw[:, None, None, None])
    return out.reshape(*lead, Ho, out_w, C)
