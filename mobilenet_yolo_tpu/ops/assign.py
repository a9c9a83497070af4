"""Vectorized YOLO target assignment.

Replaces the reference's per-image, per-GT host-side Python loop
(models/yolo_loss.py:77-178 ``get_target``) with a fully-vectorized,
jittable computation over padded GT tensors. Semantics reproduced exactly:

* **ignore mask** (yolo_loss.py:123-125): cells whose best decoded-box IoU
  against any GT is below ``ignore_thresh`` are negatives (conf weight 1,
  target 0); cells at/above the threshold are ignored (weight 0).
* **positive assignment** (yolo_loss.py:132-145): per GT, anchor-shape IoU
  against all anchors; the head slot holding the argmax anchor is positive,
  plus any in-head slot whose shape-IoU exceeds ``iou_thresh``
  (multi-anchor assignment). Grid cell from the truncated GT center.
* **class targets with label smoothing** (yolo_loss.py:425-435): once a
  cell/anchor is positive, all class channels get weight 1 and target
  ``0.5*eps``; each assigned class gets target ``1 - eps + 0.5*eps``. The
  reference's two-branch write order is order-independent in aggregate, so a
  scatter reproduces it bit-for-bit.
* **CIoU box loss terms** (yolo_loss.py:154-162): one CIoU value per
  (GT, head-slot) assignment — duplicates included, exactly as the loop
  accumulates them — weighted by ``2 - gt_area``.
* **running metrics** (yolo_loss.py:146-177): recall / avg IoU / obj /
  no-obj / class-prob / positives-per-image as masked reductions.

Padding: GT come as ``(B, T, 5)`` float arrays of ``(label, cx, cy, w, h)``
(label 1-indexed, background=0, coordinates normalized) plus an ``n_gt``
count per image; rows at index >= n_gt are ignored everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.boxes import box_ciou, cxcywh_to_corners, pairwise_iou, shape_iou


class TargetAssignment(NamedTuple):
    targets: jax.Array       # (B, H, W, A, 1+C) conf/class targets
    weights: jax.Array       # (B, H, W, A, 1+C) loss weights
    ciou: jax.Array          # (B, T, A) CIoU per potential assignment
    assign: jax.Array        # (B, T, A) bool assignment mask
    area_weight: jax.Array   # (B, T, A) (2 - gt_area) box-loss weights
    count: jax.Array         # () total number of assignments
    metrics: dict            # scalar running metrics (stop-gradient)


def build_targets(
    pred_boxes,           # (B, H, W, A, 4) decoded corner boxes (train decode)
    output,               # (B, H, W, A, 1+C) sigmoid(conf, classes)
    gt,                   # (B, T, 5) padded (label, cx, cy, w, h)
    n_gt,                 # (B,) valid-GT counts
    anchors_all_norm,     # (num_anchors, 2) all anchors, image-fraction units
    mask,                 # sequence of A ints: this head's anchor indices
    ignore_thresh: float,
    iou_thresh: float,
    label_smooth_eps: float = 0.1,
) -> TargetAssignment:
    B, H, W, A, _ = output.shape
    T = gt.shape[1]
    C = output.shape[-1] - 1
    f32 = output.dtype
    mask = jnp.asarray(mask, dtype=jnp.int32)

    valid = (jnp.arange(T)[None, :] < n_gt[:, None])              # (B, T)
    gt_boxes = cxcywh_to_corners(gt[..., 1:5])                    # (B, T, 4)

    # ---- ignore mask: max IoU of every decoded box vs any valid GT --------
    flat_pred = pred_boxes.reshape(B, H * W * A, 4)
    iou_gp = pairwise_iou(gt_boxes, flat_pred)                    # (B, T, N)
    iou_gp = jnp.where(valid[..., None], iou_gp, 0.0)
    max_iou = jnp.max(iou_gp, axis=1, initial=0.0).reshape(B, H, W, A)
    negative = max_iou < ignore_thresh                            # (B, H, W, A)

    # ---- per-GT anchor matching -------------------------------------------
    anch_iou_all = shape_iou(gt[..., 3:5], anchors_all_norm)      # (B, T, num_anchors)
    best_n = jnp.argmax(anch_iou_all, axis=-1)                    # (B, T)
    anch_iou_head = anch_iou_all[..., mask]                       # (B, T, A)
    is_best = best_n[..., None] == mask[None, None, :]            # (B, T, A)
    assign = valid[..., None] & (is_best | (anch_iou_head > iou_thresh))

    # grid cell of each GT center (truncation, as in yolo_loss.py:136-137)
    gi = jnp.clip(jnp.floor(gt[..., 1] * W).astype(jnp.int32), 0, W - 1)  # (B, T)
    gj = jnp.clip(jnp.floor(gt[..., 2] * H).astype(jnp.int32), 0, H - 1)
    cls = jnp.clip(gt[..., 0].astype(jnp.int32) - 1, 0, C - 1)           # (B, T)

    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, T, A))
    k_idx = jnp.broadcast_to(jnp.arange(A)[None, None, :], (B, T, A))
    gi_idx = jnp.broadcast_to(gi[..., None], (B, T, A))
    gj_idx = jnp.broadcast_to(gj[..., None], (B, T, A))
    cls_idx = jnp.broadcast_to(cls[..., None], (B, T, A))
    assign_f = assign.astype(f32)

    # ---- dense positive / class-assignment masks via scatter-add ----------
    pos = jnp.zeros((B, H, W, A), f32).at[b_idx, gj_idx, gi_idx, k_idx].add(assign_f) > 0
    cls_hit = (
        jnp.zeros((B, H, W, A, C), f32)
        .at[b_idx, gj_idx, gi_idx, k_idx, cls_idx]
        .add(assign_f)
        > 0
    )

    # ---- compose targets / weights ----------------------------------------
    y_true = (1.0 - label_smooth_eps) + 0.5 * label_smooth_eps
    y_false = 0.5 * label_smooth_eps
    tgt_conf = pos.astype(f32)
    w_conf = (pos | negative).astype(f32)
    tgt_cls = jnp.where(cls_hit, y_true, y_false).astype(f32)
    w_cls = jnp.broadcast_to(pos[..., None], cls_hit.shape).astype(f32)
    targets = jnp.concatenate([tgt_conf[..., None], tgt_cls], axis=-1)
    weights = jnp.concatenate([w_conf[..., None], w_cls], axis=-1)

    # ---- CIoU per assignment ----------------------------------------------
    pred_at = pred_boxes[b_idx, gj_idx, gi_idx, k_idx]            # (B, T, A, 4)
    # sanitize padded GT rows *before* the division-heavy CIoU so no NaN can
    # leak through `where` into gradients (classic where-NaN trap)
    dummy = jnp.asarray([0.0, 0.0, 1.0, 1.0], f32)
    gt_exp = jnp.broadcast_to(gt_boxes[:, :, None, :], (B, T, A, 4))
    gt_safe = jnp.where(assign[..., None], gt_exp, dummy)
    ciou, iou_el = box_ciou(gt_safe, pred_at)                      # (B, T, A)
    gt_area = (gt[..., 3] * gt[..., 4])[:, :, None]                # (B, T, 1)
    area_weight = (2.0 - gt_area) * assign_f

    count = jnp.sum(assign_f)

    # ---- running metrics (reference yolo_loss.py:146-177) -----------------
    conf_at = output[b_idx, gj_idx, gi_idx, k_idx, 0]              # (B, T, A)
    clsp_at = output[b_idx, gj_idx, gi_idx, k_idx, 1 + cls_idx]    # (B, T, A)
    obj_sum = jnp.sum(conf_at * assign_f)
    total_conf = jnp.sum(output[..., 0])
    no_cnt = B * H * W * A
    recall_sum = jnp.sum((iou_el > ignore_thresh).astype(f32) * assign_f)
    iou_sum = jnp.sum(iou_el * assign_f)
    cls_sum = jnp.sum(clsp_at * assign_f)
    safe_count = jnp.maximum(count, 1.0)
    has_pos = count > 0
    metrics = {
        "recall": jnp.where(has_pos, recall_sum / safe_count, 0.0),
        "avg_iou": jnp.where(has_pos, iou_sum / safe_count, 0.0),
        "obj": jnp.where(has_pos, obj_sum / safe_count, 0.0),
        "no_obj": jnp.where(
            has_pos, (total_conf - obj_sum) / jnp.maximum(no_cnt - count, 1.0), 0.0
        ),
        "cls_score": jnp.where(has_pos, cls_sum / safe_count, 0.0),
        "count": count / B,
    }
    metrics = jax.tree.map(jax.lax.stop_gradient, metrics)

    return TargetAssignment(
        targets=jax.lax.stop_gradient(targets),
        weights=jax.lax.stop_gradient(weights),
        ciou=ciou,
        assign=assign,
        area_weight=jax.lax.stop_gradient(area_weight),
        count=jax.lax.stop_gradient(count),
        metrics=metrics,
    )
