"""Device-side connected components + box extraction.

Replaces the reference's CPU OpenCV post-processing
(``cv2.connectedComponents`` / ``findContours`` / ``minAreaRect`` +
pyclipper unclip — SURVEY.md §2.6 N5/N6) with XLA-compiled, static-shape
kernels so detection post-processing never leaves the TPU:

1. ``connected_components``: every masked pixel starts with its own linear
   index; iterate full row/column **segmented min-scans**
   (``lax.associative_scan`` with background cells as segment resets) under
   ``lax.while_loop`` until a fixed point. One round floods minima along
   entire horizontal and vertical runs, so convergence takes
   O(#bends in the component) rounds — 2-3 for text blobs — and every op is
   a vectorized scan: no gathers (pointer jumping via label[label] is ~45x
   slower on TPU).
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


def _segmented_min_scan(values: jnp.ndarray, resets: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Running min along `axis`, restarting at positions where resets=True.

    Gather-free (associative_scan of (min, reset) pairs) — the TPU-native
    replacement for union-find pointer jumping, whose label[label] gathers
    are catastrophically slow on TPU (~45 ms/page measured on v5e vs ~1 ms
    for scan sweeps).
    """

    def combine(a, b):
        av, ar = a
        bv, br = b
        v = jnp.where(br, bv, jnp.minimum(av, bv))
        return v, ar | br

    v, _ = jax.lax.associative_scan(combine, (values, resets), axis=axis)
    return v


def _sweep(labels: jnp.ndarray, mask: jnp.ndarray, big: jnp.int32) -> jnp.ndarray:
    """One full propagation round: row fwd/bwd + col fwd/bwd segmented
    min-scans. Each sweep floods minima along entire runs, so convergence
    needs only O(#bends-in-component) rounds (2-3 for text blobs)."""
    resets = ~mask  # every background cell starts a new segment

    def scan_axis(l, axis, reverse):
        v = jnp.where(mask, l, big)
        if reverse:
            v = jnp.flip(v, axis)
            r = jnp.flip(resets, axis)
        else:
            r = resets
        out = _segmented_min_scan(v, r, axis)
        if reverse:
            out = jnp.flip(out, axis)
        return jnp.where(mask, out, big)

    l = labels
    l = scan_axis(l, 1, False)
    l = scan_axis(l, 1, True)
    l = scan_axis(l, 0, False)
    l = scan_axis(l, 0, True)
    return l


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
        return _sweep(labels, mask, big), labels, it + 1

    first = _sweep(labels0, mask, big)
    labels, _, _ = jax.lax.while_loop(cond, body, (first, labels0, jnp.int32(1)))
    return jnp.where(mask, labels, -1)


def _ccl_multigrid_single(mask: jnp.ndarray, max_iters: int) -> jnp.ndarray:
    """Two-level CCL: solve an ERODED half-resolution problem first, seed the
    fine labels from it, then finish with (few) full-res sweeps.

    The coarse mask is a 2x2 min-pool, so coarse-on cells are fully-on 2x2
    fine blocks: coarse connectivity implies fine connectivity (no false
    merges — a max-pool would bridge 1-px gaps), and every coarse seed value
    is the fine index of a real member pixel. The sweep fixed point is
    min-initial-value over each component = min own-index — IDENTICAL labels
    to the flat solve (tested) — but most unification work happens at 1/4
    cost and the full-res loop converges in ~1-2 sweeps instead of 3-5.
    """
    H, W = mask.shape
    Hc, Wc = H // 2, W // 2
    big = jnp.int32(H * W)
    m = mask[: Hc * 2, : Wc * 2]
    coarse = m[0::2, 0::2] & m[0::2, 1::2] & m[1::2, 0::2] & m[1::2, 1::2]

    lc = _ccl_single(coarse, max_iters)  # (Hc, Wc), -1 background
    cy = lc // Wc
    cx = lc - cy * Wc
    seed = jnp.where(lc >= 0, (2 * cy) * W + 2 * cx, big)  # fine idx of root cell
    seed_f = jnp.repeat(jnp.repeat(seed, 2, axis=0), 2, axis=1)
    if (Hc * 2, Wc * 2) != (H, W):  # odd edges fall back to own-index seeds
        seed_f = jnp.pad(seed_f, ((0, H - Hc * 2), (0, W - Wc * 2)), constant_values=big)

    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    labels0 = jnp.where(mask, jnp.minimum(idx, seed_f), big)

    def cond(state):
        labels, prev, it = state
        return jnp.logical_and(it < max_iters, jnp.any(labels != prev))

    def body(state):
        labels, _, it = state
        return _sweep(labels, mask, big), labels, it + 1

    first = _sweep(labels0, mask, big)
    labels, _, _ = jax.lax.while_loop(cond, body, (first, labels0, jnp.int32(1)))
    return jnp.where(mask, labels, -1)


@partial(jax.jit, static_argnames=("max_iters", "multigrid", "impl"))
def connected_components(
    mask: jnp.ndarray, max_iters: int = 64, multigrid: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """(B, H, W) bool -> (B, H, W) int32 labels (min linear index; -1 = bg).

    ``impl``: 'auto' (default) dispatches to the VMEM-resident Pallas
    kernel on TPU (`ops/pallas_ccl.py` — identical labels, ~40x faster at
    640²: 0.97 vs 39 ms/batch-8 on v5e, the XLA scans bounce every
    log-stage through HBM) and to the XLA scan solve elsewhere; 'xla' /
    'pallas' force a path. ``multigrid=True`` (XLA path only) seeds from an
    eroded half-res solve — identical labels, but measured slower on v5e
    (log-depth scans barely cheapen at half res); kept for bandwidth-bound
    backends.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .pallas_ccl import connected_components_pallas

        return connected_components_pallas(mask, max_iters=max_iters)
    if multigrid:
        # XLA miscompile guard (observed on the TPU backend, 2026-08): when a
        # computed mask (e.g. ``prob > t``) feeds the multigrid path inside a
        # LARGER jitted program, fusion/rematerialization evaluates the mask
        # inconsistently across its use sites (coarse pool vs labels0 vs the
        # final where) and most component pixels come back as the ``big``
        # sentinel. A standalone call is correct; so is the flat path. The
        # barrier forces one materialization of the mask so every consumer
        # reads the same values. Cost: one bool array per page (~0.4 MB).
        mask = jax.lax.optimization_barrier(mask)
    f = _ccl_multigrid_single if multigrid else _ccl_single
    return jax.vmap(lambda m: f(m, max_iters))(mask)


def _candidate_roots_single(labels: jnp.ndarray, max_regions: int):
    """Top-K component roots + exact areas for ONE image, gather-free.

    A root is the pixel whose label is its own index (component minimum).
    Roots compact into K2 candidate slots by prefix-rank (one 1-D cumsum)
    + a one-hot comparison sum — the previous density-ranked ``top_k``
    over all N pixels cost 4.1 of extract's 5.7 ms/batch on v5e (the
    integral-image cumsums + the N-element sort); this path is ~0.5 ms.
    Exact areas come from comparison-mask row sums. Caveat: with more than
    K2 components only the FIRST K2 in raster order compete for the K
    slots (K2 = 8K — far above any text page's word count).

    Returns ``(top_area (K,) f32, top_root (K,) i32, region_valid (K,))``.
    """
    H, W = labels.shape
    K = max_regions
    K2 = max(8 * K, 128)
    flat_lbl = labels.reshape(-1)
    valid = flat_lbl >= 0
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ).reshape(-1)
    is_root = (flat_lbl == idx) & valid

    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # root's raster ordinal
    slot = jnp.where(is_root & (rank < K2), rank, K2)  # K2 = spill bin
    onehot = slot[None, :] == jnp.arange(K2, dtype=jnp.int32)[:, None]  # (K2, N)
    cand_idx = jnp.sum(jnp.where(onehot, idx, 0), axis=1)
    cand_alive = jnp.any(onehot, axis=1)

    mask_c = (flat_lbl[None, :] == cand_idx[:, None]) & valid[None, :]  # (K2, N)
    cand_area = jnp.sum(mask_c, axis=1).astype(jnp.float32) * cand_alive

    top_area, sel = jax.lax.top_k(cand_area, K)
    top_root = jnp.take(cand_idx, sel)
    return top_area, top_root, top_area > 0


def _region_stats_single(
    labels: jnp.ndarray, scores: jnp.ndarray, max_regions: int
) -> Dict[str, jnp.ndarray]:
    """TPU-shaped region statistics.

    One ``segment_sum`` finds per-label areas (the only scatter); the top-K
    labels become boolean masks by broadcast COMPARISON (no per-pixel
    gather), score/first moments collapse into a single (K, N) x (N, F)
    MXU matmul, and rotated extents are dense masked reductions. The naive
    gather+segment_max formulation costs ~45 ms/page on v5e; this one ~3 ms.

    Second moments are CENTERED (computed from the (K, N) dx/dy planes the
    extents phase builds anyway): the raw-moment ``E[x²]−E[x]²`` route at
    640² coordinates reaches Σx² ≈ 1e9 where f32 has ~64 ulp, and the
    cancellation cost up to 1.47 rad of principal angle on near-isotropic
    regions (measured vs a float64 oracle — `ops/pallas_extract.py` has
    the same fix in its VMEM kernels).
    """
    H, W = labels.shape
    N = H * W
    K = max_regions
    flat_lbl = labels.reshape(-1)
    valid = flat_lbl >= 0
    top_area, top_root, region_valid = _candidate_roots_single(labels, K)

    # (K, N) membership masks by comparison — VPU-wide, no gathers.
    mask = (flat_lbl[None, :] == top_root[:, None]) & valid[None, :]
    mask_f = mask.astype(jnp.float32)

    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1).astype(jnp.float32)
    sc = scores.reshape(-1)

    feats = jnp.stack([sc, xs, ys], axis=1)  # (N, 3)
    M = jnp.dot(mask_f, feats, preferred_element_type=jnp.float32)  # (K, 3) MXU

    a = jnp.maximum(top_area, 1.0)
    score = M[:, 0] / a
    cx = M[:, 1] / a
    cy = M[:, 2] / a

    # centered planes (shared with the extents phase below)
    dx = xs[None, :] - cx[:, None]
    dy = ys[None, :] - cy[:, None]
    dxm = mask_f * dx
    dym = mask_f * dy
    vxx = jnp.sum(dxm * dxm, axis=1) / a
    vyy = jnp.sum(dym * dym, axis=1) / a
    vxy = jnp.sum(dxm * dym, axis=1) / a
    theta = 0.5 * jnp.arctan2(2.0 * vxy, vxx - vyy)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    # Rotated extents: project every pixel on each region's principal axes
    # (dense (K, N) math), masked min/max reductions.
    u = dx * cos_t[:, None] + dy * sin_t[:, None]
    v = -dx * sin_t[:, None] + dy * cos_t[:, None]
    big = jnp.float32(1e9)
    u0 = jnp.min(jnp.where(mask, u, big), axis=1)
    u1 = jnp.max(jnp.where(mask, u, -big), axis=1)
    v0 = jnp.min(jnp.where(mask, v, big), axis=1)
    v1 = jnp.max(jnp.where(mask, v, -big), axis=1)

    return {
        "valid": region_valid,
        "area": top_area,
        "score": score,
        "center": jnp.stack([cx, cy], axis=-1),
        "theta": theta,
        "extent_u": jnp.stack([u0, u1], axis=-1),
        "extent_v": jnp.stack([v0, v1], axis=-1),
    }


@partial(jax.jit, static_argnames=("max_regions", "impl"))
def extract_regions(
    labels: jnp.ndarray,
    scores: jnp.ndarray,
    max_regions: int = 64,
    impl: str = "auto",
) -> Dict[str, jnp.ndarray]:
    """(B,H,W) labels + prob map -> per-region stats, K fixed slots per image.

    ``impl``: both paths compute CENTERED second moments (exact angles —
    the raw-moment E[x²]−E[x]² formulation lost up to ~1.5 rad of theta
    at 640² coordinates in f32). 'auto' (default) = 'xla': inside a
    fused pipeline XLA overlaps the dense phases with neighboring ops,
    measured fastest end-to-end (336 vs 330 pages/s for the hybrid —
    RESULTS.md round 3). 'pallas' = XLA candidate phase + VMEM Pallas
    moment/extent kernels; 'pallas_full' adds the standalone candidates
    kernel — 2.1× faster than XLA when extract runs in ISOLATION
    (`ops/pallas_extract.py`). On the XLA path, lax.map (not vmap) over
    the batch keeps the (K, N) intermediates at one-image footprint
    (~50 MB at 640^2, K=32).
    """
    if impl == "auto":
        impl = "xla"
    if impl in ("pallas", "pallas_full"):
        from .pallas_extract import extract_regions_pallas

        return extract_regions_pallas(
            labels,
            scores,
            max_regions=max_regions,
            candidates="pallas" if impl == "pallas_full" else "xla",
            # off-TPU there is no Mosaic lowering — run the kernels in the
            # Pallas interpreter (slow; debugging/tests only)
            interpret=jax.default_backend() != "tpu",
        )
    return jax.lax.map(
        lambda args: _region_stats_single(args[0], args[1], max_regions),
        (labels, scores),
    )


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


def unclip_distance_inverse(
    stats: Dict[str, jnp.ndarray], shrink_ratio: float = 0.4
) -> jnp.ndarray:
    """Exact inverse of the training-time Vatti shrink, for rectangles (B, K).

    Training rasterizes the prob target from polygons shrunk inward by
    D = A(1-r^2)/P of the ORIGINAL polygon (ops/gt_maps.py; the reference's
    pyclipper MakeSegDetectionData — SURVEY.md §2.2). The reference undoes
    it at inference with the heuristic d = A'·ratio/P' of the SHRUNK region
    (ratio 1.5), which badly under-expands elongated words: for w' >> h'
    the heuristic gives d = 0.75 h' where the true inverse is d = 2.625 h'
    (at r = 0.4 the shrunk kernel is only 16% of text height, so the
    heuristic's box is ~40% of text height).

    For a w x h rectangle the shrink relation w = w' + 2D, h = h' + 2D,
    D = wh(1-r^2)/(2(w+h)) closes to a quadratic in D:

        4(1+r^2) D^2 + 2 r^2 (w'+h') D - (1-r^2) w'h' = 0

    whose positive root recovers D exactly. Used by
    ``E2EPipeline(unclip='inverse')``.
    """
    w = stats["extent_u"][..., 1] - stats["extent_u"][..., 0] + 1.0
    h = stats["extent_v"][..., 1] - stats["extent_v"][..., 0] + 1.0
    r2 = float(shrink_ratio) ** 2
    a = 4.0 * (1.0 + r2)
    b = 2.0 * r2 * (w + h)
    c = (1.0 - r2) * w * h
    d = (-b + jnp.sqrt(b * b + 4.0 * a * c)) / (2.0 * a)
    return jnp.where(stats["valid"], d, 0.0)
