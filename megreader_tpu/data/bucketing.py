"""Size bucketing for variable-size detection pages.

SURVEY.md §7 "hard parts" #5: under jit, every distinct input shape is a
fresh compilation — feeding raw page sizes causes a recompilation storm.
The fix is a small fixed set of canvas buckets: each page is scaled to fit
the smallest bucket that preserves its long side, padded bottom/right, and
batched with same-bucket pages. The pad mask keeps losses/postproc honest.

Default buckets cover ICDAR-style pages at /32-aligned sizes (FPN stride).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (640, 640),
    (640, 1152),
    (1152, 640),
    (1152, 1152),
)


def pick_bucket(
    h: int, w: int, buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS
) -> Tuple[int, int]:
    """Smallest-area bucket whose aspect can hold the page without the
    downscale factor exceeding the best achievable among buckets."""
    best, best_scale, best_area = None, -1.0, None
    for bh, bw in buckets:
        # never upscale — a bigger bucket must not win by magnification
        scale = min(bh / h, bw / w, 1.0)
        area = bh * bw
        if best is None or scale > best_scale + 1e-9 or (
            abs(scale - best_scale) <= 1e-9 and area < best_area
        ):
            best, best_scale, best_area = (bh, bw), scale, area
    return best


def fit_to_bucket(
    image: np.ndarray, bucket_hw: Tuple[int, int]
) -> Dict[str, np.ndarray]:
    """Scale (aspect-preserving, never upscale beyond fit) + pad to bucket.

    Returns {image, valid_hw, scale} where `scale` maps bucket px back to
    original px (x, y order, for representer rescaling).
    """
    import cv2

    H, W = bucket_hw
    h, w = image.shape[:2]
    # clamp at 1.0: pages smaller than the bucket are padded at native
    # scale, never magnified — matches pick_bucket's never-upscale policy
    # (ADVICE r4 #1: the unclamped version upscaled 512-px pages 1.25x
    # while the docs claimed native scale)
    s = min(H / h, W / w, 1.0)
    nh, nw = max(1, int(round(h * s))), max(1, int(round(w * s)))
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((H, W) + image.shape[2:], image.dtype)
    canvas[:nh, :nw] = resized
    return {
        "image": canvas,
        "valid_hw": np.array([nh, nw], np.int32),
        "scale": np.array([w / nw, h / nh], np.float32),
    }


class BucketBatcher:
    """Group samples by bucket; emit a batch when one fills (or on flush)."""

    def __init__(
        self,
        batch_size: int,
        buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
    ):
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self._pending: Dict[Tuple[int, int], List[Dict]] = {b: [] for b in self.buckets}

    def add(self, sample: Dict) -> List[Dict]:
        """sample must carry 'image' (H, W, C). Returns 0 or 1 ready batches."""
        h, w = sample["image"].shape[:2]
        b = pick_bucket(h, w, self.buckets)
        fitted = fit_to_bucket(sample["image"], b)
        out = dict(sample)
        out.update(fitted)
        self._pending[b].append(out)
        if len(self._pending[b]) >= self.batch_size:
            batch, self._pending[b] = self._pending[b], []
            return [self._stack(batch, b)]
        return []

    def flush(self) -> List[Dict]:
        ready = []
        for b, items in self._pending.items():
            if items:
                ready.append(self._stack(items, b))
                self._pending[b] = []
        return ready

    @staticmethod
    def _stack(items: List[Dict], bucket: Tuple[int, int]) -> Dict:
        batch = {
            "image": np.stack([i["image"] for i in items]),
            "valid_hw": np.stack([i["valid_hw"] for i in items]),
            "scale": np.stack([i["scale"] for i in items]),
            "bucket": bucket,
        }
        for k in ("polygons", "ignore", "texts", "filename"):
            if k in items[0]:
                batch[k] = [i[k] for i in items]
        return batch
