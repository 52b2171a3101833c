"""Detection representer: raw maps -> scored quads in original image coords.

Role of the reference's ``structure/representers/seg_detector_representer.py``
[U] (SURVEY.md §2.5), redesigned device-first: binarize -> connected
components -> region stats -> unclipped rotated quads all run as XLA ops on
TPU (ops/ccl.py); only the final (K, 4, 2) corner array + validity/scores
come back to the host. The reference binarizes on CPU and walks contours
with OpenCV per image — the latency hot spot its own eval loop suffers from
(SURVEY.md §3.2).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import register
from ..ops.ccl import (
    connected_components,
    extract_regions,
    regions_to_quads,
    unclip_distance_for,
)


@partial(jax.jit, static_argnames=("max_regions", "ccl_iters", "stride"))
def detect_quads_device(
    prob_maps: jnp.ndarray,
    bin_thresh: float = 0.3,
    box_thresh: float = 0.7,
    unclip_ratio: float = 1.5,
    max_regions: int = 64,
    ccl_iters: int = 64,
    stride: int = 1,
) -> Dict[str, jnp.ndarray]:
    """(B, H, W) prob maps -> {'quads' (B,K,4,2), 'scores' (B,K), 'valid' (B,K)}.

    Coordinates are in map pixels (same resolution as the model input).
    ``stride`` > 1 max-pools the map before CCL/extraction (~stride^2 less
    postproc work, <= stride/2 px coordinate error).
    """
    if stride > 1:
        prob_maps = jax.lax.reduce_window(
            prob_maps, -jnp.inf, jax.lax.max, (1, stride, stride),
            (1, stride, stride), "VALID",
        )
    mask = prob_maps > bin_thresh
    labels = connected_components(mask, max_iters=ccl_iters)
    stats = extract_regions(labels, prob_maps, max_regions=max_regions)
    d = unclip_distance_for(stats, ratio=unclip_ratio)
    quads = regions_to_quads(stats, d) * stride
    valid = stats["valid"] & (stats["score"] >= box_thresh) & (stats["area"] >= 4.0)
    return {"quads": quads, "scores": stats["score"], "valid": valid}


@partial(jax.jit, static_argnames=("max_regions", "ccl_iters", "n_bands"))
def detect_polygons_device(
    prob_maps: jnp.ndarray,
    bin_thresh: float = 0.3,
    box_thresh: float = 0.7,
    unclip_ratio: float = 1.5,
    max_regions: int = 64,
    ccl_iters: int = 64,
    n_bands: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Polygon (chain) output mode: (B, H, W) prob maps ->
    {'polygons' (B, K, 2(n_bands+1), 2), 'scores', 'valid'}.

    The reference representer's contour-approx polygon path (SURVEY.md §2.5)
    for curved text, built from per-band chains (ops/chains.py)."""
    from ..ops.chains import chains_to_polygons, extract_chains

    mask = prob_maps > bin_thresh
    labels = connected_components(mask, max_iters=ccl_iters)
    stats = extract_regions(labels, prob_maps, max_regions=max_regions)
    d = unclip_distance_for(stats, ratio=unclip_ratio)
    chains = extract_chains(labels, stats, n_bands=n_bands)
    polys = chains_to_polygons(chains, d)
    valid = stats["valid"] & (stats["score"] >= box_thresh) & (stats["area"] >= 4.0)
    return {"polygons": polys, "scores": stats["score"], "valid": valid}


@register
class SegDetectorRepresenter:
    """Host-facing wrapper: returns per-image lists of polygons + scores."""

    def __init__(
        self,
        bin_thresh: float = 0.3,
        box_thresh: float = 0.7,
        unclip_ratio: float = 1.5,
        max_regions: int = 64,
        stride: int = 1,
        #: 'quad' = min-area rotated rectangles; 'poly' = chain polygons
        #: (curved-text outlines, reference contour mode — SURVEY.md §2.5)
        mode: str = "quad",
        n_bands: int = 8,
    ):
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.unclip_ratio = unclip_ratio
        self.max_regions = max_regions
        self.stride = stride
        self.mode = mode
        self.n_bands = n_bands

    def represent(
        self, prob_maps: jnp.ndarray, scales: np.ndarray = None
    ) -> List[Dict]:
        """prob_maps (B, H, W); scales (B, 2) = (sx, sy) map->original coords.

        Returns a list of {'polygons': (n, P, 2) float32, 'scores': (n,)} —
        P = 4 in quad mode, 2(n_bands+1) in poly mode.
        """
        if self.mode == "poly":
            out = detect_polygons_device(
                prob_maps,
                bin_thresh=self.bin_thresh,
                box_thresh=self.box_thresh,
                unclip_ratio=self.unclip_ratio,
                max_regions=self.max_regions,
                n_bands=self.n_bands,
            )
            quads = np.asarray(out["polygons"])
        else:
            out = detect_quads_device(
                prob_maps,
                bin_thresh=self.bin_thresh,
                box_thresh=self.box_thresh,
                unclip_ratio=self.unclip_ratio,
                max_regions=self.max_regions,
                stride=self.stride,
            )
            quads = np.asarray(out["quads"])
        scores = np.asarray(out["scores"])
        valid = np.asarray(out["valid"])
        results = []
        B = quads.shape[0]
        for b in range(B):
            sel = valid[b]
            q = quads[b][sel]
            if scales is not None:
                q = q * np.asarray(scales[b], np.float32)[None, None, :]
            results.append({"polygons": q.astype(np.float32), "scores": scores[b][sel]})
        return results
