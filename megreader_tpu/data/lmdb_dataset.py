"""LMDB-backed recognition dataset (reference: data/ LMDB path, the
standard scene-text training format of CRNN-era repos; SURVEY.md §2.2
mentions a Megvii-internal nori dataset in the same role).

Layout follows the community convention (as in MJSynth/SynthText LMDBs):
  num-samples        -> int
  image-%09d         -> encoded JPEG/PNG bytes
  label-%09d         -> utf-8 transcript

Backend: the C ``lmdb`` package when importable, otherwise the vendored
pure-Python read-only parser (``lmdb_lite`` — meta/branch/leaf/overflow
pages, no dependencies), so the component works and is testable in this
image (VERDICT r4 task #8).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..core.registry import register


class _LmdbBackend:
    """get(key) -> bytes over either the C library or lmdb_lite."""

    def __init__(self, path: str):
        try:
            import lmdb

            self._env = lmdb.open(
                path, readonly=True, lock=False, readahead=False, meminit=False
            )
            self._lite = None
        except ImportError:
            from .lmdb_lite import Reader

            self._env = None
            self._lite = Reader(path)

    def get(self, key: bytes) -> bytes:
        if self._lite is not None:
            return self._lite.get(key)
        with self._env.begin(write=False) as txn:
            return txn.get(key)


@register
class LMDBRecognitionDataset:
    def __init__(self, path: str, canvas_hw: Tuple[int, int] = (64, 256)):
        self.db = _LmdbBackend(path)
        n = self.db.get(b"num-samples")
        if n is None:
            raise ValueError(f"{path}: missing 'num-samples' key")
        self.n = int(n.decode())
        self.canvas_hw = canvas_hw

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> Dict:
        import cv2

        img_bytes = self.db.get(f"image-{i + 1:09d}".encode())
        label = self.db.get(f"label-{i + 1:09d}".encode()).decode()
        buf = np.frombuffer(img_bytes, np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        H, W = self.canvas_hw
        h, w = img.shape[:2]
        if h > H or w > W:
            s = min(H / h, W / w)
            img = cv2.resize(img, (max(1, int(w * s)), max(1, int(h * s))))
            h, w = img.shape[:2]
        canvas = np.zeros((H, W, 3), np.uint8)
        canvas[:h, :w] = img
        return {"image": canvas, "size": np.array([h, w], np.int32), "text": label}
