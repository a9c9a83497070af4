"""YOLO head decode: raw conv logits -> boxes / confidences.

Reference semantics (models/yolo_loss.py:84-92 train, 180-204 eval):

* ``xy = sigmoid(t_xy)``; box center = ``(xy + grid) / [W, H]``
* ``wh = exp(t_wh) * anchor`` (anchors pre-normalized to image fraction)
* corner conversion in normalized units
* conf/class via sigmoid

The train variant uses the straight-through sigmoid so gradients match the
reference's identity-backward trick; the eval variant uses plain sigmoid
(identical forward values).

Layout: heads are NHWC — ``(B, H, W, A*(5+C))`` reshaped to
``(B, H, W, A, 5+C)``. The reference uses ``(B, A, 5+C, H, W)`` permuted to
``(B, A, H, W, 5+C)``; per-anchor attribute order (tx, ty, tw, th, conf,
classes...) is identical, only the (A, H, W) iteration order differs.
"""

from __future__ import annotations

import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.anchors import grid_xy
from mobilenet_yolo_tpu.ops.boxes import cxcywh_to_corners
from mobilenet_yolo_tpu.ops.sigmoid_st import sigmoid, sigmoid_st

# t_wh clip before exp. Any |t_wh| near this bound is a degenerate box
# (exp(18) ~ 6.6e7 image-widths); clipping keeps the CIoU backward finite in
# fp32 (the unclipped aspect-ratio gradient -w/h^2 overflows once boxes
# explode — the failure mode behind the reference's NaN tripwire at
# yolo_loss.py:231-232). A no-op for any sane box.
WH_CLIP = 18.0


def reshape_head(head_out, num_anchors: int):
    """(B, H, W, A*(5+C)) -> (B, H, W, A, 5+C)."""
    b, h, w, c = head_out.shape
    assert c % num_anchors == 0, (c, num_anchors)
    return head_out.reshape(b, h, w, num_anchors, c // num_anchors)


def decode_boxes_train(pred, anchors_norm):
    """Decode with straight-through sigmoid for the loss path.

    pred: (B, H, W, A, 5+C) raw logits.
    anchors_norm: (A, 2) anchors in image-fraction units.
    Returns (pred_corners, output) where
      pred_corners: (B, H, W, A, 4) normalized corner boxes,
      output: (B, H, W, A, 1+C) sigmoid(conf, classes) with identity backward.
    Mirrors reference yolo_loss.py:84-92.
    """
    _, h, w, _, _ = pred.shape
    xy = sigmoid_st(pred[..., 0:2])
    wh = jnp.exp(jnp.clip(pred[..., 2:4], -WH_CLIP, WH_CLIP))
    output = sigmoid_st(pred[..., 4:])

    grid = grid_xy(w, h, dtype=pred.dtype)[:, :, None, :]  # (H, W, 1, 2)
    inv_dim = 1.0 / jnp.asarray([w, h], dtype=pred.dtype)
    centers = (xy + grid) * inv_dim
    sizes = wh * anchors_norm  # broadcast over (A, 2)
    boxes = cxcywh_to_corners(jnp.concatenate([centers, sizes], axis=-1))
    return boxes, output


def decode_predictions(pred, anchors_norm):
    """Eval decode (reference yolo_loss.py:180-204 ``get_pred_boxes``).

    Returns a flat (B, H*W*A, 7) tensor of
    ``(x1, y1, x2, y2, conf, cls_score, cls_idx)`` in normalized units, where
    cls_score/cls_idx are the max class prob and its index. The ragged
    ``conf > val_conf`` filter of the reference becomes a mask applied by the
    NMS stage — fixed shapes end to end.
    """
    b, h, w, a, attrs = pred.shape
    xy = sigmoid(pred[..., 0:2])
    wh = jnp.exp(jnp.clip(pred[..., 2:4], -WH_CLIP, WH_CLIP))
    conf_cls = sigmoid(pred[..., 4:])

    grid = grid_xy(w, h, dtype=pred.dtype)[:, :, None, :]
    inv_dim = 1.0 / jnp.asarray([w, h], dtype=pred.dtype)
    centers = (xy + grid) * inv_dim
    sizes = wh * anchors_norm
    boxes = cxcywh_to_corners(jnp.concatenate([centers, sizes], axis=-1))

    conf = conf_cls[..., 0:1]
    cls_probs = conf_cls[..., 1:]
    cls_score = jnp.max(cls_probs, axis=-1, keepdims=True)
    cls_idx = jnp.argmax(cls_probs, axis=-1).astype(pred.dtype)[..., None]

    out = jnp.concatenate([boxes, conf, cls_score, cls_idx], axis=-1)
    return out.reshape(b, h * w * a, 7)
