"""Shared-trunk spotting pipeline: detect -> pool -> recognize, ONE trunk.

The crop pipeline (pipelines/e2e.py) re-ingests pixels for every detected
word: K crops -> recognizer CNN forwards. This program instead amortizes
ONE trunk+FPN pass over both tasks (VERDICT r3 #6; the reference's DCN
deformable RoI pooling consumed this way in its Mask TextSpotter lineage —
SURVEY.md §2.6 N1):

  pages (B, H, W, 3)
    -> SharedTrunkSpotterNet.fused_map           [one trunk+FPN pass]
    -> detect_maps('prob') -> binarize + CCL + region extraction
    -> boxes from quads (K fixed slots/page)
    -> recognize(fused, boxes): DeformRoIPooling -> BiLSTM -> CTC greedy

Same static-shape discipline as E2EPipeline: K region slots, masked
invalid slots, everything in one jitted (optionally SPMD) program.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.charset import Charset
from ..core.registry import register
from ..ops.ccl import (
    connected_components,
    extract_regions,
    regions_to_quads,
    unclip_distance_for,
    unclip_distance_inverse,
)
from ..ops.ctc import ctc_greedy_decode
from ..ops.image import normalize
from ..ops.precision import cast_floats


@register
class SpotterE2EPipeline:
    """One-trunk detect+recognize serving program for SharedTrunkSpotter."""

    def __init__(
        self,
        spotter,
        charset: Optional[Charset] = None,
        max_regions: int = 32,
        bin_thresh: float = 0.3,
        box_thresh: float = 0.6,
        unclip: str = "inverse",
        unclip_ratio: float = 1.5,
        shrink_ratio: float = 0.4,
        box_margin: float = 4.0,
        ccl_iters: int = 24,
        ccl_impl: str = "auto",
        extract_impl: str = "auto",
        bf16: bool = False,
    ):
        self.spotter = spotter
        self.charset = charset or Charset()
        self.max_regions = max_regions
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.unclip = unclip
        self.unclip_ratio = unclip_ratio
        self.shrink_ratio = shrink_ratio
        self.box_margin = box_margin
        self.ccl_iters = ccl_iters
        self.ccl_impl = ccl_impl
        self.extract_impl = extract_impl
        self.bf16 = bf16
        self._jitted = None

    def build(self, mesh=None):
        """-> jitted ``run(variables, pages) -> dict`` (one device program).

        With ``mesh``, compiles as one SPMD partition: pages batch-split
        over 'data', variables replicated (per-page independence — no
        collectives, linear ICI scaling, same layout as E2EPipeline)."""
        K = self.max_regions
        net = self.spotter.net

        platform = (
            mesh.devices.flat[0].platform
            if mesh is not None
            else jax.default_backend()
        )
        ccl_impl = self.ccl_impl
        if ccl_impl == "auto":
            ccl_impl = "pallas" if platform == "tpu" else "xla"
        extract_impl = self.extract_impl
        if extract_impl == "auto":
            extract_impl = "xla"  # mirrors ops/ccl.extract_regions 'auto'
        self.resolved_impls = {"ccl": ccl_impl, "extract": extract_impl}

        def run(variables, pages):
            B, H, W, _ = pages.shape
            x = normalize(pages)
            if self.bf16:
                x = x.astype(jnp.bfloat16)
            fused = net.apply(variables, x, train=False, method="fused_map")
            prob = net.apply(
                variables, fused, heads=("prob",), method="detect_maps"
            )["prob"].astype(jnp.float32)

            mask = prob > self.bin_thresh
            labels = connected_components(
                mask, max_iters=self.ccl_iters, impl=ccl_impl
            )
            stats = extract_regions(
                labels, prob, max_regions=K, impl=extract_impl
            )
            if self.unclip == "inverse":
                d = unclip_distance_inverse(stats, shrink_ratio=self.shrink_ratio)
            else:
                d = unclip_distance_for(stats, ratio=self.unclip_ratio)
            quads = regions_to_quads(stats, d)
            valid = stats["valid"] & (stats["score"] >= self.box_thresh) & (
                stats["area"] >= 8.0
            )

            m = self.box_margin
            x0 = jnp.clip(jnp.min(quads[..., 0], axis=-1) - m, 0, W - 1)
            x1 = jnp.clip(jnp.max(quads[..., 0], axis=-1) + m, 1, W)
            y0 = jnp.clip(jnp.min(quads[..., 1], axis=-1) - m, 0, H - 1)
            y1 = jnp.clip(jnp.max(quads[..., 1], axis=-1) + m, 1, H)
            rois = jnp.stack([x0, y0, x1, y1], axis=-1)  # (B, K, 4)

            logits = net.apply(variables, fused, rois, method="recognize")
            Bq, P, T, _ = logits.shape
            ids, lens = ctc_greedy_decode(
                logits.reshape(Bq * P, T, -1),
                jnp.full((Bq * P,), T, jnp.int32),
                blank=self.spotter.blank,
            )
            return {
                "ids": ids.reshape(B, K, -1),
                "lengths": lens.reshape(B, K),
                "quads": quads,
                "boxes": rois,
                "scores": stats["score"],
                "valid": valid,
            }

        if mesh is None:
            return jax.jit(run)
        from ..parallel.mesh import batch_sharding, replicated

        rep, bsh = replicated(mesh), batch_sharding(mesh)
        return jax.jit(run, in_shardings=(rep, bsh), out_shardings=bsh)

    def predict(self, variables, pages: jnp.ndarray) -> List[List[Dict]]:
        """pages (B, H, W, 3) float32 [0,255] -> per-page detection dicts."""
        if self.bf16:
            variables = cast_floats(variables, jnp.bfloat16)
        if self._jitted is None:
            self._jitted = self.build()
        out = self._jitted(variables, pages)
        ids = np.asarray(out["ids"])
        lens = np.asarray(out["lengths"])
        quads = np.asarray(out["quads"])
        scores = np.asarray(out["scores"])
        valid = np.asarray(out["valid"])
        results: List[List[Dict]] = []
        for b in range(ids.shape[0]):
            page = []
            for k in range(ids.shape[1]):
                if not valid[b, k]:
                    continue
                page.append({
                    "polygon": quads[b, k],
                    "text": self.charset.decode(ids[b, k][: lens[b, k]]),
                    "score": float(scores[b, k]),
                })
            results.append(page)
        return results
