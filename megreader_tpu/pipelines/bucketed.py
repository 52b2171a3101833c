"""Variable-size page serving over bucketed jitted programs.

The reference served arbitrary page sizes by resizing per page; under jit
every distinct shape is a fresh compilation, so the TPU-native form is a
small fixed bucket set (SURVEY.md §7 hard part #5): each page scales
(never upscales) into the smallest bucket that preserves it, groups with
same-bucket pages, runs the ONE compiled program per bucket shape, and
the predicted quads map back to original pixel coordinates through the
per-page scale. Detections whose center falls in the pad margin are
dropped (blank padding occasionally rings at the content border).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.registry import register
from ..data.bucketing import DEFAULT_BUCKETS, fit_to_bucket, pick_bucket


@register
class BucketedE2E:
    """Mixed-size pages -> per-page detection dicts (original coordinates).

    Wraps an ``E2EPipeline``; compiles at most ``len(buckets)`` programs
    (one per canvas), each at a fixed ``batch`` (short groups are padded
    with blank pages, results discarded).
    """

    def __init__(
        self,
        pipeline,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
        batch: int = 4,
    ):
        self.pipeline = pipeline
        self.buckets = tuple(buckets)
        self.batch = batch

    def predict(
        self, det_vars, rec_vars, images: List[np.ndarray]
    ) -> List[List[Dict]]:
        """images: list of (H, W, 3) float32/uint8 arrays, any sizes."""
        import jax.numpy as jnp

        fitted = []
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            b = pick_bucket(h, w, self.buckets)
            fitted.append(fit_to_bucket(np.asarray(img, np.float32), b))
            groups.setdefault(b, []).append(i)

        results: List[Optional[List[Dict]]] = [None] * len(images)
        for b, idxs in groups.items():
            H, W = b
            for s in range(0, len(idxs), self.batch):
                chunk = idxs[s : s + self.batch]
                pages = np.zeros((self.batch, H, W, 3), np.float32)
                for j, i in enumerate(chunk):
                    pages[j] = fitted[i]["image"]
                pred = self.pipeline.predict(
                    det_vars, rec_vars, jnp.asarray(pages)
                )
                for j, i in enumerate(chunk):
                    nh, nw = fitted[i]["valid_hw"]
                    sx, sy = fitted[i]["scale"]
                    page = []
                    for det in pred[j]:
                        poly = np.asarray(det["polygon"], np.float32)
                        cx, cy = poly[:, 0].mean(), poly[:, 1].mean()
                        if cx >= nw or cy >= nh:  # pad-margin artifact
                            continue
                        out = dict(det)
                        out["polygon"] = poly * np.array([[sx, sy]], np.float32)
                        page.append(out)
                    results[i] = page
        return results  # type: ignore[return-value]
