"""LMDB-backed recognition dataset (reference: data/ LMDB path, the
standard scene-text training format of CRNN-era repos; SURVEY.md §2.2
mentions a Megvii-internal nori dataset in the same role).

Layout follows the community convention (as in MJSynth/SynthText LMDBs):
  num-samples        -> int
  image-%09d         -> encoded JPEG/PNG bytes
  label-%09d         -> utf-8 transcript

Gated: the ``lmdb`` package is not in this image, so construction raises a
clear error unless it's importable; everything else (decode-into-canvas,
device-side resize) matches RecognitionListDataset.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..core.registry import register


@register
class LMDBRecognitionDataset:
    def __init__(self, path: str, canvas_hw: Tuple[int, int] = (64, 256)):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LMDBRecognitionDataset requires the 'lmdb' package, which is "
                "not installed in this environment. Use RecognitionListDataset "
                "or SyntheticRecognitionDataset instead."
            ) from e
        import lmdb

        self.env = lmdb.open(
            path, readonly=True, lock=False, readahead=False, meminit=False
        )
        with self.env.begin(write=False) as txn:
            self.n = int(txn.get(b"num-samples").decode())
        self.canvas_hw = canvas_hw

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> Dict:
        import cv2

        with self.env.begin(write=False) as txn:
            img_bytes = txn.get(f"image-{i + 1:09d}".encode())
            label = txn.get(f"label-{i + 1:09d}".encode()).decode()
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
