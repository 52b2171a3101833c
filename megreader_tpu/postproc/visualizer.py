"""Visualizers: overlay polygons / heatmaps / transcriptions on images.

Role of the reference's ``structure/visualizers/`` + ``concern/webcv2``
[U] (SURVEY.md §2.5): human inspection of detector maps and e2e results.
Host-side (matplotlib/cv2-free drawing via numpy where possible, cv2 for
text); writes PNGs into the experiment workspace — the headless-server
equivalent of webcv2's browser imshow.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.registry import register


def draw_polygons(
    image: np.ndarray,
    polygons: Sequence[np.ndarray],
    texts: Optional[Sequence[str]] = None,
    color=(0, 255, 0),
    thickness: int = 2,
) -> np.ndarray:
    import cv2

    canvas = np.ascontiguousarray(image.astype(np.uint8).copy())
    for i, poly in enumerate(polygons):
        pts = np.asarray(poly, np.int32).reshape(-1, 1, 2)
        cv2.polylines(canvas, [pts], True, color, thickness)
        if texts is not None and i < len(texts):
            org = (int(poly[:, 0].min()), max(12, int(poly[:, 1].min()) - 4))
            cv2.putText(
                canvas, str(texts[i]), org, cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                (255, 64, 64), 1, cv2.LINE_AA,
            )
    return canvas


def heatmap_overlay(image: np.ndarray, prob_map: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    import cv2

    hm = (np.clip(prob_map, 0, 1) * 255).astype(np.uint8)
    hm = cv2.applyColorMap(hm, cv2.COLORMAP_JET)
    hm = cv2.cvtColor(hm, cv2.COLOR_BGR2RGB)
    return (image.astype(np.float32) * (1 - alpha) + hm.astype(np.float32) * alpha).astype(np.uint8)


@register
class DetectionVisualizer:
    def __init__(self, workspace: str = "/tmp/megreader_tpu_vis"):
        self.dir = workspace
        os.makedirs(self.dir, exist_ok=True)

    def visualize(
        self,
        name: str,
        image: np.ndarray,
        polygons: Sequence[np.ndarray],
        texts: Optional[Sequence[str]] = None,
        prob_map: Optional[np.ndarray] = None,
    ) -> str:
        import cv2

        canvas = draw_polygons(image, polygons, texts)
        if prob_map is not None:
            canvas = np.concatenate([canvas, heatmap_overlay(image, prob_map)], axis=1)
        path = os.path.join(self.dir, f"{name}.png")
        cv2.imwrite(path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        return path
