"""Segmentation quality metrics.

The reference publishes no segmentation metric for its BDD100K multi-task
model (README.md:39-45 ships a checkpoint only); this adds standard
per-class IoU / mIoU over thresholded sigmoid maps so the seg head is
actually measurable.
"""

from __future__ import annotations

import jax.numpy as jnp


def seg_intersection_union(pred_maps, truth, threshold: float = 0.5):
    """Per-class intersection and union pixel counts.

    pred_maps: (B, H, W, C) sigmoid maps; truth: (B, H, W, C) {0,1} maps.
    Returns (intersection (C,), union (C,)) — accumulate across batches and
    divide at the end for dataset IoU.
    """
    p = pred_maps >= threshold
    t = truth >= 0.5
    inter = jnp.sum(p & t, axis=(0, 1, 2))
    union = jnp.sum(p | t, axis=(0, 1, 2))
    return inter, union


def mean_iou(intersection, union) -> tuple:
    """(per-class IoU array, mIoU). Classes absent from both pred and truth
    count as IoU 1 (standard convention for empty classes)."""
    union = jnp.asarray(union)
    intersection = jnp.asarray(intersection)
    iou = jnp.where(union > 0, intersection / jnp.maximum(union, 1), 1.0)
    return iou, float(jnp.mean(iou))


class SegMetricAccumulator:
    def __init__(self, num_classes: int):
        import numpy as np
        self.inter = np.zeros(num_classes, np.int64)
        self.union = np.zeros(num_classes, np.int64)

    def add_batch(self, pred_maps, truth, threshold: float = 0.5):
        import numpy as np
        inter, union = seg_intersection_union(pred_maps, truth, threshold)
        self.inter += np.asarray(inter, np.int64)
        self.union += np.asarray(union, np.int64)

    def compute(self) -> tuple:
        return mean_iou(self.inter, self.union)
