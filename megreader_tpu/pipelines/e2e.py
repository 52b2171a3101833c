"""End-to-end page pipeline: detect -> crop -> recognize (judged config #5).

The reference composes this on the host: detector maps -> CPU polygon
extraction -> cv2 perspective crops -> recognizer batches (SURVEY.md §3.2/
§3.3). Here the whole hot path is ONE jitted device program per page batch:

  pages (B, H, W, 3)
    -> SegDetectorNet -> prob maps (B, H, W)
    -> binarize + CCL + region extraction (ops/ccl, device)
    -> K fixed region slots/page, axis-aligned crop+resize via MXU matmuls
       (ops/image.crop_resize_boxes)
    -> (B*K, 32, 100, 3) -> CTC recognizer -> greedy decode
    -> ids/lengths/valid masks to host, charset lookup (strings only)

Static shapes throughout: K is a fixed max-regions budget; invalid slots
are masked, not dropped.
"""

from __future__ import annotations

import functools
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
from ..ops.image import crop_resize_boxes, normalize
from ..ops.precision import cast_floats


@register
class E2EPipeline:
    """detect -> crop -> recognize, batched multi-page, device-resident."""

    def __init__(
        self,
        detector,
        recognizer,
        charset: Optional[Charset] = None,
        max_regions: int = 32,
        bin_thresh: float = 0.3,
        box_thresh: float = 0.6,
        unclip_ratio: float = 1.5,
        #: 'ratio' = the reference's heuristic d = A'·ratio/P' of the shrunk
        #: region; 'inverse' (default) = exact closed-form inverse of the
        #: training shrink (ops/ccl.unclip_distance_inverse) — recovers full
        #: text height on elongated words where the heuristic under-expands.
        #: A/B on 128 pages/condition (scripts/ab_unclip.py, TPU): upright
        #: e2e recall tied at 0.9967; rotated 0.9865 (inverse) vs 0.9850
        #: (ratio 1.5) vs 0.9716 (ratio 2.0).
        unclip: str = "inverse",
        shrink_ratio: float = 0.4,
        crop_hw=(32, 100),
        box_margin: float = 4.0,
        deskew: bool = False,
        #: 'perspective' (default) | 'box' | 'deskew' | 'chain'. Perspective
        #: is the straight-text quality path AND within 5% of box throughput
        #: (342 vs 359 pages/s v5e batch-8): with GT quads the recognizer
        #: reads rectified crops at 100% on both upright and rotated pages,
        #: while GT BOXES read 90.1%/44.3% (scripts/diag_rec_domain.py).
        #: 'chain' is the CURVED-text path (reference polygon mode, SURVEY.md
        #: §2.5): band chains along each component's principal axis
        #: (ops/chains.py) drive a piecewise unwarp that straightens curved
        #: baselines a single homography cannot.
        rectify: str = "perspective",
        #: bands per region in chain mode (S boundary spine points = S+1)
        n_bands: int = 8,
        ccl_iters: int = 24,
        ccl_multigrid: bool = False,
        ccl_impl: str = "auto",
        bf16: bool = False,
        extract_impl: str = "auto",
        rec_mode: str = "greedy",
        beam_width: int = 8,
    ):
        self.detector = detector
        self.recognizer = recognizer
        if charset is None:
            # attention models emit GO/EOS/PAD-offset ids (AttentionCharset)
            from ..core.charset import AttentionCharset

            charset = (
                AttentionCharset()
                if hasattr(recognizer, "decode_greedy")
                else Charset()
            )
        self.charset = charset
        #: recognition decode: 'greedy' | 'beam' — dispatched per family
        #: (CTC / 2D-CTC ``decode(mode=...)``, attention
        #: ``decode_greedy``/``decode_beam``), all device-traceable
        self.rec_mode = rec_mode
        self.beam_width = beam_width
        self.max_regions = max_regions
        self.bin_thresh = bin_thresh
        self.box_thresh = box_thresh
        self.unclip_ratio = unclip_ratio
        self.unclip = unclip
        self.shrink_ratio = shrink_ratio
        self.crop_hw = tuple(crop_hw)
        self.box_margin = box_margin
        # NOTE: the round-1/2 ``postproc_stride=2`` mode (CCL on a pooled
        # mask) was REMOVED in round 3: the VMEM-resident Pallas CCL kernel
        # made exact stride-1 postproc nearly free (CCL 1.3 ms of a 23.6 ms
        # batch), so the pooled mode's measured win shrank to 1.2x while
        # still costing -26 pts of recall from +-2 px quad coarseness — a
        # trap, not a trade-off (VERDICT r2 #4).
        #: straighten rotated regions (three-shear deskew by the component's
        #: principal angle) before recognition — for rotated-text pages.
        self.deskew = deskew
        #: crop geometry: 'box' = axis-aligned bbox (fastest, upright text);
        #: 'deskew' = box + three-shear rotation by the principal angle;
        #: 'perspective' = exact homography rectification of the rotated
        #: quad on the MXU path (ops/image.rectify_quads_mxu) — for
        #: significantly rotated/perspective text (SURVEY.md §2.6 N5).
        # legacy deskew flag upgrades an unspecified rectify mode only
        self.rectify = "deskew" if (deskew and rectify == "perspective") else rectify
        self.n_bands = n_bands
        #: CCL sweep cap. Text components converge in <5 sweeps; the cap
        #: bounds worst-case latency on adversarial masks (a hit means a
        #: serpentine component splits into several boxes — benign).
        self.ccl_iters = ccl_iters
        #: seed full-res labels from an eroded half-res solve. Identical
        #: labels (tested), but measured SLOWER on v5e text pages (87.3 vs
        #: 73.0 ms/batch-8): associative-scan sweeps are log-depth, so the
        #: half-res solve costs nearly as much per sweep as full res and
        #: the coarse while_loop adds iterations. Off by default; kept for
        #: shapes/backends where sweeps are bandwidth-bound.
        self.ccl_multigrid = ccl_multigrid
        #: CCL solver: 'auto' resolves per target platform at build() time
        #: (Pallas VMEM kernel on TPU, XLA scans elsewhere)
        self.ccl_impl = ccl_impl
        self.bf16 = bf16
        #: region-stats path: 'auto' = VMEM Pallas kernels on TPU
        #: (ops/pallas_extract.py), XLA elsewhere; 'xla'/'pallas' force
        self.extract_impl = extract_impl
        self._jitted = None

    def _decode_crops(self, rec_vars, crops):
        """(N, Ho, Wo, 3) normalized crops -> (ids (N, T), lengths (N,)).

        Family dispatch mirrors ``RecognizerPredictor`` but stays inside the
        jitted page program — the reference composed its pipeline with any
        recognizer config the same way (SURVEY.md §3.3)."""
        rec = self.recognizer
        if hasattr(rec, "decode_greedy"):  # attention family
            if self.rec_mode == "beam":
                return rec.decode_beam(rec_vars, crops, beam_width=self.beam_width)
            return rec.decode_greedy(rec_vars, crops)
        if hasattr(rec, "decode"):  # CTC / 2D-CTC
            return rec.decode(
                rec_vars, crops, mode=self.rec_mode, beam_width=self.beam_width
            )
        logits = rec.net.apply(rec_vars, crops, train=False)
        N, T = logits.shape[0], logits.shape[1]
        return ctc_greedy_decode(
            logits.astype(jnp.float32), jnp.full((N,), T, jnp.int32)
        )

    def build(self, det_vars=None, rec_vars=None, mesh=None):
        """Return the jitted device program
        ``run(det_vars, rec_vars, pages) -> dict`` (public surface for
        benches/harnesses that drive the program directly).

        With ``mesh`` (a ``jax.sharding.Mesh``), the program compiles as one
        SPMD partition: pages batch-split over the 'data' axis, variables
        replicated, every output batch-split. The whole page program
        (detect -> CCL -> extract -> rectify -> recognize) is independent
        per page, so XLA inserts no cross-device collectives at all — serving
        scales linearly over ICI-connected chips."""
        K = self.max_regions
        Ho, Wo = self.crop_hw

        # Resolve 'auto' kernel impls against the platform the program will
        # actually RUN on: with a mesh that is the mesh's devices — NOT the
        # process default backend, which may be a live TPU while the mesh is
        # the virtual-CPU dryrun (Pallas kernels can't lower on CPU).
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
            # mirrors ops/ccl.extract_regions: centered-XLA won the
            # in-pipeline A/B on TPU (RESULTS.md round 3) and is the only
            # lowering elsewhere
            extract_impl = "xla"
        #: attribution for benches: what 'auto' resolved to on this build
        self.resolved_impls = {"ccl": ccl_impl, "extract": extract_impl}

        def run(det_vars, rec_vars, pages):
            B, H, W, _ = pages.shape
            x = normalize(pages)
            if self.bf16:
                x = x.astype(jnp.bfloat16)
            # serving only binarizes the prob map at a fixed threshold — the
            # DB thresh head is a training auxiliary, so skip its whole
            # full-res tail (nearly half the head compute)
            maps = self.detector.net.apply(
                det_vars, x, train=False, heads=("prob",)
            )
            prob = maps["prob"].astype(jnp.float32)

            mask = prob > self.bin_thresh
            labels = connected_components(
                mask, max_iters=self.ccl_iters, multigrid=self.ccl_multigrid,
                impl=ccl_impl,
            )
            stats = extract_regions(
                labels, prob, max_regions=K, impl=extract_impl
            )
            if self.unclip == "inverse":
                d = unclip_distance_inverse(stats, shrink_ratio=self.shrink_ratio)
            else:
                d = unclip_distance_for(stats, ratio=self.unclip_ratio)
            quads = regions_to_quads(stats, d)  # (B, K, 4, 2), px
            valid = stats["valid"] & (stats["score"] >= self.box_thresh) & (
                stats["area"] >= 8.0
            )

            m = self.box_margin
            x0 = jnp.clip(jnp.min(quads[..., 0], axis=-1) - m, 0, W - 1)
            x1 = jnp.clip(jnp.max(quads[..., 0], axis=-1) + m, 1, W)
            y0 = jnp.clip(jnp.min(quads[..., 1], axis=-1) - m, 0, H - 1)
            y1 = jnp.clip(jnp.max(quads[..., 1], axis=-1) + m, 1, H)
            boxes = jnp.stack([x0, y0, x1, y1], axis=-1)  # (B, K, 4)

            polygons = None
            if self.rectify == "chain":
                from ..ops.chains import (
                    chain_arc_length,
                    chains_to_band_quads,
                    chains_to_polygons,
                    extract_chains,
                    resample_width,
                )
                from ..ops.image import rectify_quads_mxu

                S = self.n_bands
                chains = extract_chains(labels, stats, n_bands=S)
                dm = d + m * 0.5  # unclip + rectify margin, like qm above
                band_quads = chains_to_band_quads(chains, dm)
                polygons = chains_to_polygons(chains, d)
                # piecewise unwarp: each band -> a stretched (Ho, Wb) slice;
                # shared boundary edges make the reassembled word C0-smooth
                Wb = max(Wo // S, 8)
                # warp='bilinear': band quads are trapezoids on curves (the
                # outer edge is ~2x the inner once unclip inflates half_h);
                # a homography sags the spine toward the long edge (~7/48
                # rows measured), garbling every curved crop — the ruled
                # map keeps the spine on the output midline (round-5 fix)
                slices = rectify_quads_mxu(
                    pages, band_quads.reshape(B, K * S, 4, 2), (Ho, Wb),
                    crop_hw=(48, 64), aspect="stretch", warp="bilinear",
                )  # (B, K*S, Ho, Wb, 3)
                stretched = (
                    slices.reshape(B, K, S, Ho, Wb, 3)
                    .transpose(0, 1, 3, 2, 4, 5)
                    .reshape(B, K, Ho, S * Wb, 3)
                )
                # restore training-crop aspect (height-fit, left-aligned)
                L = chain_arc_length(chains, dm)  # (B, K)
                th = 2.0 * (jnp.mean(chains["half_h"], axis=-1) + dm)
                tw = jnp.clip(
                    jnp.round(L * Ho / jnp.maximum(th, 1.0)), 2.0, float(Wo)
                )
                crops = resample_width(stretched, tw, Wo).reshape(
                    B * K, Ho, Wo, 3
                )
            elif self.rectify == "perspective":
                from ..ops.image import rectify_quads_mxu

                # margin along the quad's own axes (same role as box_margin)
                c = quads.mean(axis=-2, keepdims=True)
                qm = quads + jnp.sign(quads - c) * (m * 0.5)
                crops = rectify_quads_mxu(
                    pages, qm, (Ho, Wo), aspect="preserve_h"
                ).reshape(B * K, Ho, Wo, 3)
            else:
                crops = crop_resize_boxes(
                    pages, boxes, (Ho, Wo), aspect="preserve_h"
                )  # (B,K,Ho,Wo,C) — undistorted, left-aligned like training
                crops = crops.reshape(B * K, Ho, Wo, 3)
                if self.rectify == "deskew":
                    from ..ops.image import rotate_crops

                    crops = rotate_crops(crops, stats["theta"].reshape(B * K))
            crops = normalize(crops)
            if self.bf16:
                crops = crops.astype(jnp.bfloat16)
            ids, lens = self._decode_crops(rec_vars, crops)
            T = ids.shape[1]
            out = {
                "ids": ids.reshape(B, K, T),
                "lengths": lens.reshape(B, K),
                "quads": quads,
                "boxes": boxes,
                "scores": stats["score"],
                "valid": valid,
            }
            if polygons is not None:
                out["polygons"] = polygons  # (B, K, 2(S+1), 2) chain mode
            return out

        if mesh is None:
            return jax.jit(run)
        from ..parallel.mesh import batch_sharding, replicated

        rep, bsh = replicated(mesh), batch_sharding(mesh)
        return jax.jit(run, in_shardings=(rep, rep, bsh), out_shardings=bsh)

    # back-compat alias (pre-round-3 callers)
    _build = build

    def predict(self, det_vars, rec_vars, pages: jnp.ndarray) -> List[List[Dict]]:
        """pages (B, H, W, 3) float32 [0,255] -> per-page detection dicts."""
        if self.bf16:
            det_vars = cast_floats(det_vars, jnp.bfloat16)
            rec_vars = cast_floats(rec_vars, jnp.bfloat16)
        if self._jitted is None:
            self._jitted = self._build(det_vars, rec_vars)
        out = self._jitted(det_vars, rec_vars, pages)
        ids = np.asarray(out["ids"])
        lens = np.asarray(out["lengths"])
        quads = np.asarray(out["quads"])
        scores = np.asarray(out["scores"])
        valid = np.asarray(out["valid"])
        polys = (
            np.asarray(out["polygons"]) if "polygons" in out else None
        )  # chain mode: full curved outlines instead of quads
        results: List[List[Dict]] = []
        for b in range(ids.shape[0]):
            page = []
            for k in range(ids.shape[1]):
                if not valid[b, k]:
                    continue
                text = self.charset.decode(ids[b, k][: lens[b, k]])
                page.append(
                    {
                        "polygon": polys[b, k] if polys is not None else quads[b, k],
                        "quad": quads[b, k],
                        "text": text,
                        "score": float(scores[b, k]),
                    }
                )
            results.append(page)
        return results
