"""Device-side connected components + box extraction.

Replaces the reference's CPU OpenCV post-processing
(``cv2.connectedComponents`` / ``findContours`` / ``minAreaRect`` +
pyclipper unclip — SURVEY.md §2.6 N5/N6) with XLA-compiled, static-shape
kernels so detection post-processing never leaves the TPU:

1. ``connected_components``: union-find-free labeling — every masked pixel
   starts with its own linear index; iterate {4-neighborhood min, pointer
   jumping (label <- label[label])} under ``lax.while_loop`` until a fixed
   point. Pointer jumping makes convergence O(log diameter), so snake-like
   components don't need O(HW) sweeps.
2. ``extract_regions``: per-component stats via one ``segment_sum`` pass
   (area, score mass, centroid, second moments), top-K components by area,
   principal-axis orientation from the covariance eigenvector, then a second
   segment pass projecting pixels onto each component's axes for exact
   rotated-rectangle extents (the min-area-rect surrogate).
3. ``unclip_quads``: Vatti-offset replacement — for rectangles the
   pyclipper offset by ``area * ratio / perimeter`` is exactly an extent
   expansion by that distance on each side.

Everything is (B, H, W) batched, vmapped over B, fixed K regions out.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _label_step(labels: jnp.ndarray, mask: jnp.ndarray, big: jnp.int32):
    """One round: neighborhood min then two pointer jumps. labels: (H, W)."""
    H, W = labels.shape
    padded = jnp.pad(labels, 1, constant_values=big)
    neigh = jnp.minimum(
        jnp.minimum(padded[:-2, 1:-1], padded[2:, 1:-1]),
        jnp.minimum(padded[1:-1, :-2], padded[1:-1, 2:]),
    )
    new = jnp.where(mask, jnp.minimum(labels, neigh), big)
    flat = new.reshape(-1)
    safe = jnp.where(mask.reshape(-1), flat, 0)
    # pointer jump ×2: label <- label[label]
    for _ in range(2):
        jumped = flat.reshape(-1)[jnp.clip(safe, 0, H * W - 1)]
        flat = jnp.where(mask.reshape(-1), jnp.minimum(flat, jumped), big)
        safe = jnp.where(mask.reshape(-1), flat, 0)
    return flat.reshape(H, W)


def _ccl_single(mask: jnp.ndarray, max_iters: int) -> jnp.ndarray:
    H, W = mask.shape
    big = jnp.int32(H * W)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    labels0 = jnp.where(mask, idx, big)

    def cond(state):
        labels, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(labels != prev))

    def body(state):
        labels, _, it = state
        new = _label_step(labels, mask, big)
        return new, labels, it + 1

    first = _label_step(labels0, mask, big)
    labels, _, _ = jax.lax.while_loop(cond, body, (first, labels0, jnp.int32(1)))
    return jnp.where(mask, labels, -1)


@partial(jax.jit, static_argnames=("max_iters",))
def connected_components(mask: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """(B, H, W) bool -> (B, H, W) int32 labels (root linear index; -1 = bg)."""
    return jax.vmap(lambda m: _ccl_single(m, max_iters))(mask)


def _region_stats_single(
    labels: jnp.ndarray, scores: jnp.ndarray, max_regions: int
) -> Dict[str, jnp.ndarray]:
    H, W = labels.shape
    N = H * W
    flat_lbl = labels.reshape(-1)
    valid = flat_lbl >= 0
    seg = jnp.where(valid, flat_lbl, 0)

    ys = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1)).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1)).astype(jnp.float32)
    one = valid.astype(jnp.float32)
    sc = scores.reshape(-1) * one

    def ssum(v):
        return jax.ops.segment_sum(v, seg, num_segments=N)

    area = ssum(one)
    score_mass = ssum(sc)
    sx, sy = ssum(xs * one), ssum(ys * one)
    sxx, syy, sxy = ssum(xs * xs * one), ssum(ys * ys * one), ssum(xs * ys * one)

    # Top-K roots by area (non-roots have area 0).
    top_area, top_root = jax.lax.top_k(area, max_regions)
    region_valid = top_area > 0

    a = jnp.maximum(top_area, 1.0)
    cx = jnp.take(sx, top_root) / a
    cy = jnp.take(sy, top_root) / a
    # covariance
    vxx = jnp.take(sxx, top_root) / a - cx * cx
    vyy = jnp.take(syy, top_root) / a - cy * cy
    vxy = jnp.take(sxy, top_root) / a - cx * cy
    # principal angle of the 2x2 covariance: 0.5*atan2(2*vxy, vxx-vyy)
    theta = 0.5 * jnp.arctan2(2.0 * vxy, vxx - vyy)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    # Second pass: project each pixel on its component's principal axes.
    # Map every pixel's root to its slot in the top-K list (or -1).
    slot_of_root = jnp.full((N,), -1, jnp.int32)
    slot_of_root = slot_of_root.at[top_root].set(
        jnp.where(region_valid, jnp.arange(max_regions, dtype=jnp.int32), -1)
    )
    pix_slot = jnp.where(valid, jnp.take(slot_of_root, seg), -1)
    in_topk = pix_slot >= 0
    pslot = jnp.where(in_topk, pix_slot, 0)

    pcos = jnp.take(cos_t, pslot)
    psin = jnp.take(sin_t, pslot)
    pcx = jnp.take(cx, pslot)
    pcy = jnp.take(cy, pslot)
    u = (xs - pcx) * pcos + (ys - pcy) * psin
    v = -(xs - pcx) * psin + (ys - pcy) * pcos
    big = jnp.float32(1e9)

    def smin(vals):
        return -jax.ops.segment_max(
            jnp.where(in_topk, -vals, -big), pslot, num_segments=max_regions
        )

    def smax(vals):
        return jax.ops.segment_max(
            jnp.where(in_topk, vals, -big), pslot, num_segments=max_regions
        )

    u0, u1 = smin(u), smax(u)
    v0, v1 = smin(v), smax(v)

    return {
        "valid": region_valid,
        "area": top_area,
        "score": jnp.take(score_mass, top_root) / a,
        "center": jnp.stack([cx, cy], axis=-1),
        "theta": theta,
        "extent_u": jnp.stack([u0, u1], axis=-1),
        "extent_v": jnp.stack([v0, v1], axis=-1),
    }


@partial(jax.jit, static_argnames=("max_regions",))
def extract_regions(
    labels: jnp.ndarray, scores: jnp.ndarray, max_regions: int = 64
) -> Dict[str, jnp.ndarray]:
    """(B,H,W) labels + prob map -> per-region stats, K fixed slots per image."""
    return jax.vmap(lambda l, s: _region_stats_single(l, s, max_regions))(labels, scores)


def regions_to_quads(
    stats: Dict[str, jnp.ndarray], unclip_distance: jnp.ndarray = None
) -> jnp.ndarray:
    """Rotated-rect corners (B, K, 4, 2) in (x, y), clockwise from axis-min.

    ``unclip_distance``: optional (B, K) outward offset per region (the
    pyclipper-unclip equivalent; exact for rectangles).
    """
    c = stats["center"]  # (B, K, 2)
    th = stats["theta"]  # (B, K)
    u0, u1 = stats["extent_u"][..., 0], stats["extent_u"][..., 1]
    v0, v1 = stats["extent_v"][..., 0], stats["extent_v"][..., 1]
    # half-pixel pad: extents measured at pixel centers
    u0, u1, v0, v1 = u0 - 0.5, u1 + 0.5, v0 - 0.5, v1 + 0.5
    if unclip_distance is not None:
        u0 = u0 - unclip_distance
        u1 = u1 + unclip_distance
        v0 = v0 - unclip_distance
        v1 = v1 + unclip_distance
    cos_t, sin_t = jnp.cos(th), jnp.sin(th)

    def corner(uu, vv):
        x = c[..., 0] + uu * cos_t - vv * sin_t
        y = c[..., 1] + uu * sin_t + vv * cos_t
        return jnp.stack([x, y], axis=-1)

    return jnp.stack(
        [corner(u0, v0), corner(u1, v0), corner(u1, v1), corner(u0, v1)], axis=-2
    )  # (B, K, 4, 2)


def unclip_distance_for(stats: Dict[str, jnp.ndarray], ratio: float = 1.5) -> jnp.ndarray:
    """pyclipper-style offset distance d = area * ratio / perimeter (B, K)."""
    w = stats["extent_u"][..., 1] - stats["extent_u"][..., 0] + 1.0
    h = stats["extent_v"][..., 1] - stats["extent_v"][..., 0] + 1.0
    area = w * h
    perim = 2.0 * (w + h)
    return jnp.where(stats["valid"], area * ratio / jnp.maximum(perim, 1e-6), 0.0)
