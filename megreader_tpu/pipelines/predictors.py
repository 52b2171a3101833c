"""Single-task predictors: recognizer and detector (demo.py / eval.py API).

The user-facing equivalents of the reference's eval/demo paths: arrays in,
strings/polygons out, everything heavy jitted on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.charset import AttentionCharset, Charset
from ..core.registry import register
from ..ops.ctc import ctc_beam_decode, ctc_greedy_decode
from ..ops.image import normalize, resize_with_aspect_pad
from ..postproc.detection import SegDetectorRepresenter


@register
class RecognizerPredictor:
    """Word crops -> strings. Handles CTC / 2D-CTC / attention tasks."""

    def __init__(self, model, charset=None, crop_hw=(32, 100), mode: str = "greedy",
                 beam_width: int = 8, int8: bool = False):
        self.model = model
        self.crop_hw = tuple(crop_hw)
        self.mode = mode
        self.beam_width = beam_width
        #: int8 serving (ops/quantize.py): every Conv/Dense in the decode
        #: path on the s8xs8->s32 MXU pipe; fp32/bf16 checkpoints unchanged
        self.int8 = int8
        if charset is None:
            charset = (
                AttentionCharset()
                if model.__class__.__name__ == "AttentionRecognizer"
                else Charset()
            )
        self.charset = charset
        self._prep = jax.jit(self._prep_impl)

    def _prep_impl(self, canvases, sizes):
        img, _w = resize_with_aspect_pad(canvases, sizes, self.crop_hw)
        return normalize(img)

    def predict(self, variables, canvases, sizes) -> List[str]:
        from contextlib import nullcontext

        img = self._prep(jnp.asarray(canvases, jnp.float32), jnp.asarray(sizes))
        if self.int8:
            from ..ops.quantize import int8_context

            ctx = int8_context()
        else:
            ctx = nullcontext()
        with ctx:
            return self._decode(variables, img)

    def _decode(self, variables, img) -> List[str]:
        if hasattr(self.model, "decode_greedy"):  # attention family
            if self.mode == "beam":
                ids, lens = self.model.decode_beam(variables, img, beam_width=self.beam_width)
            else:
                ids, lens = self.model.decode_greedy(variables, img)
        else:
            if self.mode == "beam" and hasattr(self.model, "decode"):
                try:
                    ids, lens = self.model.decode(variables, img, mode="beam",
                                                  beam_width=self.beam_width)
                except TypeError:  # 2D-CTC decode() has no mode kwarg
                    ids, lens = self.model.decode(variables, img)
            else:
                try:
                    ids, lens = self.model.decode(variables, img, mode="greedy")
                except TypeError:
                    ids, lens = self.model.decode(variables, img)
        return self.charset.decode_batch(np.asarray(ids), np.asarray(lens))


@register
class DetectorPredictor:
    """Pages -> polygons + scores (original image coordinates)."""

    def __init__(self, model, representer: Optional[SegDetectorRepresenter] = None):
        self.model = model
        self.representer = representer or SegDetectorRepresenter()
        self._forward = None

    def predict(self, variables, pages, scales=None) -> List[Dict]:
        if self._forward is None:
            self._forward = jax.jit(
                lambda v, x: self.model.net.apply(
                    v, normalize(x), train=False, heads=("prob",)
                )["prob"]
            )
        prob = self._forward(variables, jnp.asarray(pages, jnp.float32))
        return self.representer.represent(prob, scales=scales)
