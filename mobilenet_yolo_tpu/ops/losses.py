"""Loss functions: weighted MSE, per-head YOLO loss, segmentation loss.

Scale fidelity with the reference is deliberate — the weighted-MSE
normalisation by the (mask-dependent) weight sum (yolo_loss.py:53-60), the
``/ num_assignments`` on the CIoU term (yolo_loss.py:224) and the
``iou_weighting`` scale (yolo_loss.py:234) together set the effective
learning rates, so they are preserved exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.assign import build_targets
from mobilenet_yolo_tpu.ops.decode import decode_boxes_train, reshape_head
from mobilenet_yolo_tpu.ops.sigmoid_st import sigmoid_st


def weighted_mse_loss(x, target, weights):
    """``sum((x - t)^2 * w) / sum(w)`` (reference yolo_loss.py:53-60)."""
    total = jnp.sum(weights)
    out = (x - target) ** 2 * weights
    return jnp.sum(out) / jnp.maximum(total, 1e-12)


class HeadLoss(NamedTuple):
    loss: jnp.ndarray
    metrics: dict


def yolo_head_loss(
    head_out,            # (B, H, W, A*(5+C)) raw conv output
    gt,                  # (B, T, 5) padded GT
    n_gt,                # (B,)
    anchors_all_norm,    # (num_anchors, 2)
    mask,                # this head's anchor indices
    num_classes: int,
    ignore_thresh: float,
    iou_thresh: float,
    iou_weighting: float,
    label_smooth_eps: float = 0.1,
) -> HeadLoss:
    """Single-head training loss (reference yolo_loss.py:206-236).

    ``loss = weighted_mse(sigmoid(conf,cls), targets, weights)
             + iou_weighting * weighted_mse(ciou, 1, area_w) / count``
    with gradients flowing through the straight-through sigmoid on conf/cls
    and through CIoU -> decoded boxes -> (xy sigmoid_st, wh exp) on boxes.
    """
    mask = list(mask)
    num_anchors_head = len(mask)
    pred = reshape_head(head_out, num_anchors_head)
    anchors_head = anchors_all_norm[jnp.asarray(mask)]
    pred_boxes, output = decode_boxes_train(pred, anchors_head)

    tgt = build_targets(
        pred_boxes, output, gt, n_gt, anchors_all_norm, mask,
        ignore_thresh=ignore_thresh, iou_thresh=iou_thresh,
        label_smooth_eps=label_smooth_eps,
    )

    conf_cls_loss = weighted_mse_loss(output, tgt.targets, tgt.weights)

    # CIoU loss (yolo_loss.py:220-224). The reference *intends* a
    # (2 - gt_area)-weighted mse, but its weighted_mse_loss broadcasts the
    # (N,1) squared error against the (N,) weights into an (N,N) outer
    # product, so the weights cancel exactly: the effective loss is the
    # plain mean of (ciou - 1)^2 over assignments. Verified bit-for-bit
    # against the executed reference (tests/test_reference_parity.py);
    # reproduced here faithfully. tgt.area_weight still carries the
    # intended weights should anyone want the fixed formulation.
    sq = (tgt.ciou - 1.0) ** 2 * tgt.assign.astype(tgt.ciou.dtype)
    iou_loss = jnp.where(
        tgt.count > 0,
        jnp.sum(sq) / jnp.maximum(tgt.count, 1.0),
        0.0,
    )

    loss = conf_cls_loss + iou_loss * iou_weighting
    metrics = dict(tgt.metrics)
    metrics["conf_cls_loss"] = conf_cls_loss
    metrics["iou_loss"] = iou_loss
    return HeadLoss(loss=loss, metrics=metrics)


def seg_loss(seg_logits, seg_truth):
    """Segmentation loss (reference models/seg_loss.py:51-77).

    seg_logits: (B, H, W, C) raw head output (NHWC; the reference is NCHW).
    seg_truth:  (B, H, W, C) rasterized {0,1} maps.
    Returns (0.05 * mean((sigmoid_st(x) - t)^2), mean obj activation,
    mean no-obj activation).
    """
    output = sigmoid_st(seg_logits)
    # all-ones weights -> weighted mse reduces to the mean
    loss = jnp.mean((output - seg_truth) ** 2)
    obj_mask = seg_truth >= 0.5
    obj_cnt = jnp.sum(obj_mask)
    no_cnt = jnp.sum(~obj_mask)
    obj_mean = jnp.sum(jnp.where(obj_mask, output, 0.0)) / jnp.maximum(obj_cnt, 1)
    no_obj_mean = jnp.sum(jnp.where(obj_mask, 0.0, output)) / jnp.maximum(no_cnt, 1)
    return loss * 0.05, obj_mean, no_obj_mean
