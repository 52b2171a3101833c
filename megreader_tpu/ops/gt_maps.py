"""Device-side detection ground-truth rasterization (VERDICT r1 #4).

The reference generates detection training targets on the host per sample
(``data/processes/`` MakeSegDetectionData / MakeBorderMap [U], SURVEY.md
§2.2): pyclipper polygon shrink + cv2.fillPoly + cv2.distanceTransform in
DataLoader workers. Round-1 kept that host path (data/processes.py) and it
capped detector training at ~20 im/s vs a 71 im/s device step. This module
moves the whole rasterization into the jitted train-step prelude:

* Geometry is exact for convex polygons (ICDAR quads): the inward offset
  region {p inside poly and dist(p, boundary) >= d} IS the pyclipper shrink,
  and the point-to-segment distance over edges IS cv2.distanceTransform's
  L2 target (ours exact, cv2's 3x3-mask approximate).
* Everything is dense per-pixel math over (P, H, W): inside tests are edge
  cross-product signs, distances are vectorized point-segment formulas —
  pure VPU work, no gathers, no host round-trips. `lax.map` over the batch
  keeps intermediates at one-image footprint.
* Semantics mirror data/processes.py: d = A(1-r^2)/Perimeter per polygon;
  ignored or tiny (min side < min_text_size) polygons mask out their region
  instead of contributing; degenerate shrinks (empty erosion) mask out too.

Host keeps only the trivial part: padding the per-image polygon lists to a
static (P, 4, 2) buffer (data/loader.py detection_collate_polys).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _polygon_geometry(poly: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(V, 2) -> (|area|, perimeter)."""
    x, y = poly[:, 0], poly[:, 1]
    xn, yn = jnp.roll(x, -1), jnp.roll(y, -1)
    area = 0.5 * jnp.abs(jnp.sum(x * yn - y * xn))
    perim = jnp.sum(jnp.sqrt((xn - x) ** 2 + (yn - y) ** 2))
    return area, perim


def _inside_and_distance(
    poly: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convex inside-mask and exact distance-to-boundary for every pixel.

    poly (V, 2); xs, ys (H, W) pixel-center coords. Returns (inside (H,W)
    bool, dist (H,W) float32 = min point-to-segment distance over edges).
    """
    a = poly  # (V, 2)
    b = jnp.roll(poly, -1, axis=0)
    ex = (b[:, 0] - a[:, 0])[:, None, None]  # (V, 1, 1)
    ey = (b[:, 1] - a[:, 1])[:, None, None]
    px = xs[None] - a[:, 0][:, None, None]  # (V, H, W)
    py = ys[None] - a[:, 1][:, None, None]

    cross = ex * py - ey * px  # (V, H, W)
    # Convex test robust to orientation: all-non-negative or all-non-positive.
    inside = jnp.all(cross >= 0, axis=0) | jnp.all(cross <= 0, axis=0)

    L2 = ex * ex + ey * ey
    t = jnp.clip((px * ex + py * ey) / jnp.maximum(L2, 1e-9), 0.0, 1.0)
    dx = px - t * ex
    dy = py - t * ey
    dist = jnp.sqrt(jnp.min(dx * dx + dy * dy, axis=0))
    return inside, dist


def _gt_single(
    polys: jnp.ndarray,
    valid: jnp.ndarray,
    ignore: jnp.ndarray,
    hw: Tuple[int, int],
    shrink_ratio: float,
    min_text_size: float,
    thresh_min: float,
    thresh_max: float,
) -> Dict[str, jnp.ndarray]:
    H, W = hw
    P = polys.shape[0]
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

    def per_poly(poly):
        area, perim = _polygon_geometry(poly)
        d = area * (1.0 - shrink_ratio**2) / jnp.maximum(perim, 1e-6)
        inside, dist = _inside_and_distance(poly, xs, ys)
        h = jnp.max(poly[:, 1]) - jnp.min(poly[:, 1])
        w = jnp.max(poly[:, 0]) - jnp.min(poly[:, 0])
        too_small = jnp.minimum(h, w) < min_text_size
        shrunk = inside & (dist >= d)
        degenerate = jnp.sum(shrunk) < 1
        band = inside | (dist <= d)  # convex dilation by d
        falloff = jnp.clip(1.0 - dist / jnp.maximum(d, 1e-6), 0.0, 1.0) * band
        return shrunk, inside, band, falloff, too_small | degenerate

    shrunk, inside, band, falloff, bad = jax.vmap(per_poly)(polys)  # (P, H, W)
    valid_f = valid & ~ignore
    contributes = valid_f & ~bad  # real positive text instances
    masked_out = valid & (ignore | (valid_f & bad))  # excluded regions

    def or_over(m, sel):
        return jnp.any(m & sel[:, None, None], axis=0)

    gt = or_over(shrunk, contributes).astype(jnp.float32)
    mask = 1.0 - or_over(inside, masked_out).astype(jnp.float32)
    # Border targets for every non-ignored polygon (host make_border_maps
    # skips only ignores, not tiny/degenerate ones — mirrored here).
    border_sel = valid_f
    thresh_mask = or_over(band, border_sel).astype(jnp.float32)
    canvas = jnp.max(
        jnp.where(border_sel[:, None, None], falloff, 0.0), axis=0
    )
    thresh_map = canvas * (thresh_max - thresh_min) + thresh_min
    return {
        "gt": gt,
        "mask": mask,
        "thresh_map": thresh_map,
        "thresh_mask": thresh_mask,
    }


def _gt_single_tiled(
    polys: jnp.ndarray,
    valid: jnp.ndarray,
    ignore: jnp.ndarray,
    hw: Tuple[int, int],
    tile_hw: Tuple[int, int],
    shrink_ratio: float,
    min_text_size: float,
    thresh_min: float,
    thresh_max: float,
) -> Dict[str, jnp.ndarray]:
    """Bbox-localized rasterization: identical maps to ``_gt_single`` at a
    fraction of the memory traffic.

    The dense formulation materializes (P, V, H, W) intermediates — ~100 MB
    per 640² page at P=16 — and is HBM-bound (~129 ms/batch-8 measured,
    SLOWER than the 115 ms train step it feeds). But a text polygon only
    touches its d-dilated bbox, so each polygon rasterizes into a static
    (TH, TW) tile placed by dynamic_slice and max/min-merged back into the
    page canvases inside a scan over P. Polygons whose dilated bbox exceeds
    the tile (rare: banner-sized text) fall back to the exact full-page
    path via lax.cond, so results are bit-identical to ``_gt_single`` for
    every input (tested).
    """
    H, W = hw
    TH, TW = min(tile_hw[0], H), min(tile_hw[1], W)
    P = polys.shape[0]

    def per_poly_tile(poly, y0, x0):
        xs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.float32, (TH, TW), 1
        )
        ys = y0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.float32, (TH, TW), 0
        )
        area, perim = _polygon_geometry(poly)
        d = area * (1.0 - shrink_ratio**2) / jnp.maximum(perim, 1e-6)
        inside, dist = _inside_and_distance(poly, xs, ys)
        h = jnp.max(poly[:, 1]) - jnp.min(poly[:, 1])
        w = jnp.max(poly[:, 0]) - jnp.min(poly[:, 0])
        too_small = jnp.minimum(h, w) < min_text_size
        shrunk = inside & (dist >= d)
        degenerate = jnp.sum(shrunk) < 1
        band = inside | (dist <= d)
        falloff = jnp.clip(1.0 - dist / jnp.maximum(d, 1e-6), 0.0, 1.0) * band
        return shrunk, inside, band, falloff, too_small | degenerate

    def scan_body(carry, inp):
        gt, keep, tmask, canvas = carry
        poly, v, ig = inp
        area, perim = _polygon_geometry(poly)
        d = area * (1.0 - shrink_ratio**2) / jnp.maximum(perim, 1e-6)
        pad = d + 2.0
        x0 = jnp.clip(
            jnp.floor(jnp.min(poly[:, 0]) - pad), 0.0, float(W - TW)
        ).astype(jnp.int32)
        y0 = jnp.clip(
            jnp.floor(jnp.min(poly[:, 1]) - pad), 0.0, float(H - TH)
        ).astype(jnp.int32)

        shrunk, inside, band, falloff, bad = per_poly_tile(poly, y0, x0)
        valid_f = v & ~ig
        contributes = valid_f & ~bad
        masked_out = v & (ig | (valid_f & bad))

        tile_gt = jax.lax.dynamic_slice(gt, (y0, x0), (TH, TW))
        tile_keep = jax.lax.dynamic_slice(keep, (y0, x0), (TH, TW))
        tile_tm = jax.lax.dynamic_slice(tmask, (y0, x0), (TH, TW))
        tile_cv = jax.lax.dynamic_slice(canvas, (y0, x0), (TH, TW))
        tile_gt = jnp.maximum(
            tile_gt, (shrunk & contributes).astype(jnp.float32)
        )
        tile_keep = jnp.minimum(
            tile_keep, 1.0 - (inside & masked_out).astype(jnp.float32)
        )
        tile_tm = jnp.maximum(tile_tm, (band & valid_f).astype(jnp.float32))
        tile_cv = jnp.maximum(tile_cv, jnp.where(valid_f, falloff, 0.0))
        gt = jax.lax.dynamic_update_slice(gt, tile_gt, (y0, x0))
        keep = jax.lax.dynamic_update_slice(keep, tile_keep, (y0, x0))
        tmask = jax.lax.dynamic_update_slice(tmask, tile_tm, (y0, x0))
        canvas = jax.lax.dynamic_update_slice(canvas, tile_cv, (y0, x0))
        return (gt, keep, tmask, canvas), None

    zeros = jnp.zeros((H, W), jnp.float32)
    (gt, keep, tmask, canvas), _ = jax.lax.scan(
        scan_body, (zeros, zeros + 1.0, zeros, zeros), (polys, valid, ignore)
    )
    tiled = {
        "gt": gt,
        "mask": keep,
        "thresh_map": canvas * (thresh_max - thresh_min) + thresh_min,
        "thresh_mask": tmask,
    }

    # Exactness guard: any valid polygon whose d-dilated bbox can't fit the
    # tile gets the dense full-page path (both results merge trivially since
    # the fallback recomputes EVERYTHING — it simply replaces the output).
    areas = 0.5 * jnp.abs(
        jnp.sum(
            polys[:, :, 0] * jnp.roll(polys[:, :, 1], -1, axis=1)
            - polys[:, :, 1] * jnp.roll(polys[:, :, 0], -1, axis=1),
            axis=1,
        )
    )
    perims = jnp.sum(
        jnp.sqrt(
            jnp.sum(
                (jnp.roll(polys, -1, axis=1) - polys) ** 2, axis=-1
            )
        ),
        axis=1,
    )
    ds = areas * (1.0 - shrink_ratio**2) / jnp.maximum(perims, 1e-6)
    bw = jnp.max(polys[:, :, 0], axis=1) - jnp.min(polys[:, :, 0], axis=1)
    bh = jnp.max(polys[:, :, 1], axis=1) - jnp.min(polys[:, :, 1], axis=1)
    too_big = valid & (
        (bw + 2.0 * (ds + 2.0) > TW) | (bh + 2.0 * (ds + 2.0) > TH)
    )
    return jax.lax.cond(
        jnp.any(too_big),
        lambda: _gt_single(
            polys, valid, ignore, hw, shrink_ratio, min_text_size,
            thresh_min, thresh_max,
        ),
        lambda: tiled,
    )


@partial(
    jax.jit,
    static_argnames=(
        "hw", "shrink_ratio", "min_text_size", "thresh_min", "thresh_max",
        "tile_hw",
    ),
)
def make_detection_gt(
    polygons: jnp.ndarray,
    poly_valid: jnp.ndarray,
    poly_ignore: jnp.ndarray,
    hw: Tuple[int, int],
    shrink_ratio: float = 0.4,
    min_text_size: float = 4.0,
    thresh_min: float = 0.3,
    thresh_max: float = 0.7,
    tile_hw: Tuple[int, int] = (192, 384),
) -> Dict[str, jnp.ndarray]:
    """Batched GT maps from padded polygon buffers, fully on device.

    polygons: (B, P, V, 2) float32 pixel coords (V=4 for quads);
    poly_valid / poly_ignore: (B, P) bool. Returns {gt, mask, thresh_map,
    thresh_mask} each (B, H, W) float32 — the exact batch layout the
    SegDetector loss consumes (models/detector.py).

    ``tile_hw``: per-polygon rasterization tile (bbox-localized fast path);
    ``None`` forces the dense full-page formulation. Pages with any polygon
    larger than the tile transparently use the dense path (lax.cond), so
    outputs are identical either way. lax.map over B bounds intermediates
    at one image.
    """
    if tile_hw is None:
        return jax.lax.map(
            lambda args: _gt_single(
                args[0], args[1], args[2], hw, shrink_ratio, min_text_size,
                thresh_min, thresh_max,
            ),
            (polygons, poly_valid, poly_ignore),
        )
    return jax.lax.map(
        lambda args: _gt_single_tiled(
            args[0], args[1], args[2], hw, tile_hw, shrink_ratio,
            min_text_size, thresh_min, thresh_max,
        ),
        (polygons, poly_valid, poly_ignore),
    )


_nonquad_warned = False


def _is_convex(p) -> bool:
    """Orientation-consistent cross-product test for an (V, 2) polygon."""
    import numpy as np

    e = np.roll(p, -1, axis=0) - p
    cross = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
    return bool(np.all(cross >= -1e-6) or np.all(cross <= 1e-6))


def pad_polygons(polys, ignore, max_polys: int, n_vertices: int = 4):
    """Host-side: list of (V, 2) arrays -> static (P, V, 2) + masks.

    ``detection_collate_polys`` sizes ``max_polys`` to cover every polygon
    in the batch (power-of-two bucketing), so nothing is dropped here;
    overflow of a caller-fixed capacity raises rather than silently
    training dropped instances as background.

    The device rasterizer is exact for CONVEX polygons only, and >4-vertex
    annotations are decimated to ``n_vertices`` by index resampling — both
    silently change GT for curved/MLT-style polygons, so the first such
    input warns loudly (ADVICE r2 #3): datasets with non-quad annotations
    should use the host cv2 path (``Experiment(device_gt=False)``), which
    rasterizes arbitrary polygons exactly.
    """
    import numpy as np

    global _nonquad_warned

    if len(polys) > max_polys:
        raise ValueError(
            f"{len(polys)} polygons exceed buffer capacity {max_polys}; "
            "size the buffer to the batch (detection_collate_polys does)"
        )
    buf = np.zeros((max_polys, n_vertices, 2), np.float32)
    valid = np.zeros((max_polys,), bool)
    ign = np.zeros((max_polys,), bool)
    for i, (p, ig) in enumerate(zip(polys, ignore)):
        p = np.asarray(p, np.float32)
        if p.shape[0] != n_vertices or not _is_convex(p):
            if p.shape[0] != n_vertices:  # resample/clip to the static count
                idx = np.linspace(0, p.shape[0] - 1, n_vertices).round().astype(int)
                p = p[idx]
            if not _nonquad_warned:
                import warnings

                warnings.warn(
                    "device-GT path received a non-quad or non-convex "
                    "polygon; it will be approximated by a (possibly "
                    "decimated) convex rasterization. For curved/polygon "
                    "annotations use Experiment(device_gt=False) — the "
                    "host cv2 path rasterizes arbitrary polygons exactly.",
                    stacklevel=3,
                )
                _nonquad_warned = True
        buf[i] = p
        valid[i] = True
        ign[i] = bool(ig)
    return buf, valid, ign
