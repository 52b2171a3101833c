"""Measurers: ICDAR15-protocol detection P/R/H-mean; recognition accuracy/NED.

Role of the reference's ``structure/measurers/`` + ``concern/icdar2015_eval``
[U] (SURVEY.md §2.5): greedy IoU-0.5 matching with don't-care (ignore)
regions for detection; exact-match sequence accuracy and normalized edit
distance for recognition. Pure numpy on host — metrics are tiny and
eval-only; polygon IoU uses the Sutherland–Hodgman clip (we have no
shapely/pyclipper in this image, and none is needed).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..core.registry import register


# ---------------------------------------------------------------------------
# Polygon geometry (convex-safe; detection quads + ICDAR GT quads are convex)
# ---------------------------------------------------------------------------


def polygon_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` by convex `clip` polygon."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def intersect(p1, p2, a, b):
        dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
        dx2, dy2 = b[0] - a[0], b[1] - a[1]
        denom = dx1 * dy2 - dy1 * dx2
        if abs(denom) < 1e-12:
            return p2
        t = ((a[0] - p1[0]) * dy2 - (a[1] - p1[1]) * dx2) / denom
        return (p1[0] + t * dx1, p1[1] + t * dy1)

    # Ensure clip polygon is counter-clockwise for the inside test.
    if np.dot(clip[:, 0], np.roll(clip[:, 1], -1)) - np.dot(clip[:, 1], np.roll(clip[:, 0], -1)) < 0:
        clip = clip[::-1]

    output = [tuple(p) for p in subject]
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list, output = output, []
        if not input_list:
            break
        s = input_list[-1]
        for p in input_list:
            if inside(p, a, b):
                if not inside(s, a, b):
                    output.append(intersect(s, p, a, b))
                output.append(p)
            elif inside(s, a, b):
                output.append(intersect(s, p, a, b))
            s = p
    return np.array(output, np.float64) if output else np.zeros((0, 2))


def polygon_iou(p1: np.ndarray, p2: np.ndarray) -> float:
    from .. import native

    fast = native.polygon_iou(p1, p2)
    if fast is not None:
        return fast
    inter_poly = clip_polygon(p1.astype(np.float64), p2.astype(np.float64))
    if len(inter_poly) < 3:
        return 0.0
    inter = polygon_area(inter_poly)
    union = polygon_area(p1) + polygon_area(p2) - inter
    return inter / union if union > 0 else 0.0


def polygon_intersection_over_self(p: np.ndarray, other: np.ndarray) -> float:
    """|p ∩ other| / |p| — the don't-care overlap test."""
    inter_poly = clip_polygon(p.astype(np.float64), other.astype(np.float64))
    if len(inter_poly) < 3:
        return 0.0
    a = polygon_area(p)
    return polygon_area(inter_poly) / a if a > 0 else 0.0


# ---------------------------------------------------------------------------
# Detection measurer (ICDAR15 protocol)
# ---------------------------------------------------------------------------


@register
class DetectionMeasurer:
    """IoU-0.5 greedy matching with ignore ('###') region handling."""

    def __init__(self, iou_thresh: float = 0.5, ignore_overlap: float = 0.5):
        self.iou_thresh = iou_thresh
        self.ignore_overlap = ignore_overlap

    def measure_one(
        self,
        pred_polys: Sequence[np.ndarray],
        gt_polys: Sequence[np.ndarray],
        gt_ignored: Sequence[bool],
    ) -> Dict[str, int]:
        care_gt = [g for g, ig in zip(gt_polys, gt_ignored) if not ig]
        ignore_gt = [g for g, ig in zip(gt_polys, gt_ignored) if ig]

        # Drop predictions that mostly overlap a don't-care region.
        kept_preds = []
        for p in pred_polys:
            if any(
                polygon_intersection_over_self(p, ig) > self.ignore_overlap
                for ig in ignore_gt
            ):
                continue
            kept_preds.append(p)

        matched_gt = set()
        tp = 0
        for p in kept_preds:
            best_iou, best_j = 0.0, -1
            for j, g in enumerate(care_gt):
                if j in matched_gt:
                    continue
                iou = polygon_iou(p, g)
                if iou > best_iou:
                    best_iou, best_j = iou, j
            if best_iou >= self.iou_thresh:
                matched_gt.add(best_j)
                tp += 1
        return {"tp": tp, "n_pred": len(kept_preds), "n_gt": len(care_gt)}

    def gather(self, raws: List[Dict[str, int]]) -> Dict[str, float]:
        tp = sum(r["tp"] for r in raws)
        n_pred = sum(r["n_pred"] for r in raws)
        n_gt = sum(r["n_gt"] for r in raws)
        precision = tp / n_pred if n_pred else 0.0
        recall = tp / n_gt if n_gt else 0.0
        hmean = (
            2 * precision * recall / (precision + recall) if precision + recall else 0.0
        )
        return {"precision": precision, "recall": recall, "hmean": hmean}


# ---------------------------------------------------------------------------
# Recognition measurer
# ---------------------------------------------------------------------------


def edit_distance(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@register
class RecognitionMeasurer:
    """Exact-match accuracy + normalized edit distance (case-folded)."""

    def __init__(self, case_sensitive: bool = False):
        self.case_sensitive = case_sensitive

    def measure(self, preds: Sequence[str], gts: Sequence[str]) -> Dict[str, float]:
        assert len(preds) == len(gts)
        n = len(preds)
        if n == 0:
            return {"accuracy": 0.0, "ned": 0.0, "n": 0}
        correct, ned = 0, 0.0
        for p, g in zip(preds, gts):
            if not self.case_sensitive:
                p, g = p.lower(), g.lower()
            correct += p == g
            denom = max(len(p), len(g), 1)
            ned += 1.0 - edit_distance(p, g) / denom
        return {"accuracy": correct / n, "ned": ned / n, "n": n}
