"""Boundary/edge-case tests across the numerics stack."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.data.synthetic import pad_labels
from mobilenet_yolo_tpu.ops.assign import build_targets
from mobilenet_yolo_tpu.ops.decode import WH_CLIP, decode_boxes_train, reshape_head
from mobilenet_yolo_tpu.ops.losses import yolo_head_loss
from mobilenet_yolo_tpu.ops.nms import batched_nms

ANCHORS = np.asarray([[0.3, 0.4], [0.45, 0.45], [0.6, 0.7],
                      [0.08, 0.1], [0.14, 0.2], [0.2, 0.16]], np.float32)


def test_nms_no_valid_candidates():
    preds = np.zeros((2, 50, 7), np.float32)
    preds[..., 4] = 0.01  # all below gate
    dets, keep = batched_nms(jnp.asarray(preds), 0.5, top_k=16)
    assert dets.shape == (2, 16, 7)
    assert not np.asarray(keep).any()


def test_gt_center_at_edge_clips_to_grid():
    """A GT center at exactly 1.0 must clip into the last cell, not index
    out of bounds (the reference would crash here)."""
    A, C, H, W = 3, 3, 4, 4
    head = np.zeros((1, H, W, A * (5 + C)), np.float32)
    pred = reshape_head(jnp.asarray(head), A)
    pb, out = decode_boxes_train(pred, jnp.asarray(ANCHORS[:3]))
    gt = np.zeros((1, 2, 5), np.float32)
    gt[0, 0] = [1, 1.0, 1.0, 0.3, 0.4]   # center exactly at the border
    res = build_targets(pb, out, jnp.asarray(gt), jnp.asarray([1]),
                        jnp.asarray(ANCHORS), [0, 1, 2], 0.5, 0.5)
    assert int(res.count) >= 1
    assert np.isfinite(np.asarray(res.ciou)).all()


def test_wh_clip_keeps_gradients_finite():
    """Extreme t_wh logits (beyond the clip) must not produce inf boxes or
    NaN gradients through the loss."""
    A, C, H, W = 3, 3, 4, 4
    head = np.zeros((1, H, W, A * (5 + C)), np.float32)
    head[0, 1, 1, 2] = 100.0   # t_w huge
    head[0, 2, 2, 3] = -100.0  # t_h tiny
    gt = np.zeros((1, 1, 5), np.float32)
    gt[0, 0] = [1, 0.4, 0.4, 0.3, 0.3]

    def loss(h):
        return yolo_head_loss(h, jnp.asarray(gt), jnp.asarray([1]),
                              jnp.asarray(ANCHORS), [0, 1, 2], C,
                              0.5, 0.5, 0.02).loss

    val, grad = jax.value_and_grad(loss)(jnp.asarray(head))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    # the clip bound itself
    pred = reshape_head(jnp.asarray(head), A)
    boxes, _ = decode_boxes_train(pred, jnp.asarray(ANCHORS[:3]))
    assert np.isfinite(np.asarray(boxes)).all()
    assert float(np.abs(np.asarray(boxes)).max()) < np.exp(WH_CLIP) * 2


def test_all_images_empty_gt_loss_finite():
    A, C, H, W = 3, 3, 4, 4
    rng = np.random.default_rng(0)
    head = rng.normal(0, 1, (2, H, W, A * (5 + C))).astype(np.float32)
    gt = np.zeros((2, 4, 5), np.float32)
    out = yolo_head_loss(jnp.asarray(head), jnp.asarray(gt),
                         jnp.asarray([0, 0]), jnp.asarray(ANCHORS),
                         [0, 1, 2], C, 0.5, 0.5, 0.02)
    assert np.isfinite(float(out.loss))
    assert float(out.metrics["count"]) == 0.0
    assert float(out.metrics["iou_loss"]) == 0.0


def test_max_gt_truncation():
    labels = [np.tile(np.asarray([[1, 0.5, 0.5, 0.1, 0.1]], np.float32),
                      (20, 1))]
    gt, n_gt = pad_labels(labels, max_gt=8)
    assert gt.shape == (1, 8, 5)
    assert n_gt[0] == 8


def test_duplicate_gt_same_cell_counted_twice():
    """Two identical GTs in the same cell both contribute assignments
    (reference loop semantics: duplicates included)."""
    A, C, H, W = 3, 3, 4, 4
    head = np.zeros((1, H, W, A * (5 + C)), np.float32)
    pred = reshape_head(jnp.asarray(head), A)
    pb, out = decode_boxes_train(pred, jnp.asarray(ANCHORS[:3]))
    gt = np.zeros((1, 2, 5), np.float32)
    gt[0, 0] = [1, 0.4, 0.4, 0.3, 0.4]
    gt[0, 1] = [2, 0.4, 0.4, 0.3, 0.4]
    res = build_targets(pb, out, jnp.asarray(gt), jnp.asarray([2]),
                        jnp.asarray(ANCHORS), [0, 1, 2], 0.5, 0.99)
    assert int(res.count) == 2  # best-anchor assignment for each GT
    # both classes marked positive at (gj=1, gi=1, anchor 0 = exact match)
    t = np.asarray(res.targets)
    y_true = np.float32((1 - 0.1) + 0.5 * 0.1)
    cell = t[0, 1, 1, 0]  # (1+C,) conf + class targets
    assert cell[0] == 1.0
    assert cell[1] == y_true and cell[2] == y_true  # classes 1 and 2
    assert cell[3] == np.float32(0.05)              # unassigned class: y_false
