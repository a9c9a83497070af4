"""Batched mAP evaluation driver with the val_conf feedback controller.

Reproduces reference train.py:333-424 (``test``): run detection over the
eval set, collect per-image detections and ground truths, adjust the
confidence gate from the predicted/GT box-count ratio, and compute VOC
11-point mAP.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from mobilenet_yolo_tpu.ops.ap import calculate_mAP


def adjust_confidence(gt_box_num: int, pred_box_num: int, conf: float) -> float:
    """val_conf feedback controller (reference train.py:434-440)."""
    if pred_box_num > gt_box_num * 3:
        conf = conf + 0.01
    elif pred_box_num < gt_box_num * 2 and conf > 0.01:
        conf = conf - 0.01
    return conf


class Evaluator:
    """Accumulates detections/GT over batches and computes mAP.

    ``add_batch`` consumes the fixed-K padded outputs of
    :func:`mobilenet_yolo_tpu.eval.detector.make_predict_fn` plus padded GT
    arrays; padding is stripped here on the host (the reference keeps
    ragged python lists throughout, train.py:348-394).
    """

    def __init__(self, classes_name: list[str]):
        self.classes_name = list(classes_name)
        self.reset()

    def reset(self):
        self.det_boxes: list[np.ndarray] = []
        self.det_labels: list[np.ndarray] = []
        self.det_scores: list[np.ndarray] = []
        self.true_boxes: list[np.ndarray] = []
        self.true_labels: list[np.ndarray] = []
        self.true_difficulties: list[np.ndarray] = []
        self.gt_box_count = 0
        self.pred_box_count = 0
        self.n_images = 0

    def add_batch(self, dets, keep, gt, n_gt, difficulties=None):
        """dets: (B,K,7); keep: (B,K); gt: (B,T,5) (label,cx,cy,w,h); n_gt: (B,)."""
        dets = np.asarray(dets)
        keep = np.asarray(keep)
        gt = np.asarray(gt)
        n_gt = np.asarray(n_gt)
        for b in range(dets.shape[0]):
            d = dets[b][keep[b]]
            self.det_boxes.append(d[:, :4])
            self.det_labels.append(d[:, 6].astype(np.int64) + 1)
            self.det_scores.append(d[:, 4] * d[:, 5])
            self.pred_box_count += len(d)

            n = int(n_gt[b])
            g = gt[b, :n]
            cx, cy, w, h = g[:, 1], g[:, 2], g[:, 3], g[:, 4]
            boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
            self.true_boxes.append(boxes.astype(np.float32))
            self.true_labels.append(g[:, 0].astype(np.int64))
            if difficulties is not None:
                self.true_difficulties.append(np.asarray(difficulties[b][:n], np.float32))
            else:
                self.true_difficulties.append(np.zeros(n, np.float32))
            self.gt_box_count += n
            self.n_images += 1

    def compute(self):
        return calculate_mAP(
            self.det_boxes, self.det_labels, self.det_scores,
            self.true_boxes, self.true_labels, self.true_difficulties,
            self.classes_name,
        )

    def adjusted_conf(self, conf: float) -> float:
        return adjust_confidence(self.gt_box_count, self.pred_box_count, conf)


def run_evaluation(
    predict_fn: Callable,
    variables,
    batches: Iterable,
    classes_name: list[str],
    val_conf: float,
):
    """Convenience driver: returns (mAP, per-class APs, new_val_conf).

    ``batches``: (images, gt, n_gt[, gt_difficult]) tuples or Loader-style
    dicts (which carry ``gt_difficult`` when the shard has the flag).
    """
    ev = Evaluator(classes_name)
    for batch in batches:
        if isinstance(batch, dict):
            images, gt, n_gt = batch["images"], batch["gt"], batch["n_gt"]
            diffs = batch.get("gt_difficult")
        else:
            images, gt, n_gt = batch[0], batch[1], batch[2]
            diffs = batch[3] if len(batch) > 3 else None
        out = predict_fn(variables, images, val_conf)
        dets, keep = out[0], out[1]
        ev.add_batch(dets, keep, gt, n_gt, difficulties=diffs)
    aps, mAP, tp, fp = ev.compute()
    return mAP, aps, ev.adjusted_conf(val_conf)
