"""Box primitives: coordinate conversions, pairwise IoU, CIoU/GIoU.

Reproduces the math of reference utils/iou.py (find_intersection /
find_union / find_jaccard_overlap over corner boxes) and
models/yolo_loss.py:243-319 (wh_to_x2y2, box_c, box_ciou, box_giou) as pure
broadcast-friendly JAX functions. All boxes are ``(..., 4)`` arrays; corner
boxes are ``(x1, y1, x2, y2)``, center boxes are ``(cx, cy, w, h)``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cxcywh_to_corners(box):
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Reference yolo_loss.py:243-247."""
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    x1 = cx - w / 2
    y1 = cy - h / 2
    return jnp.stack([x1, y1, x1 + w, y1 + h], axis=-1)


def corners_to_cxcywh(box):
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    w = x2 - x1
    h = y2 - y1
    return jnp.stack([x1 + w / 2, y1 + h / 2, w, h], axis=-1)


def area(box):
    """Signed area of corner boxes (reference yolo_loss.py:318-319)."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def pairwise_iou(set_1, set_2):
    """IoU between every pair of corner boxes: (n1,4) x (n2,4) -> (n1,n2).

    Matches reference utils/iou.py:32-49 (intersection clamped at 0; union
    uses signed areas, so degenerate inputs behave identically).
    """
    lower = jnp.maximum(set_1[..., :, None, :2], set_2[..., None, :, :2])
    upper = jnp.minimum(set_1[..., :, None, 2:], set_2[..., None, :, 2:])
    wh = jnp.clip(upper - lower, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area(set_1)[..., :, None] + area(set_2)[..., None, :] - inter
    return inter / union


def elementwise_iou(box1, box2):
    """IoU between aligned corner boxes of the same shape (..., 4) -> (...)."""
    lower = jnp.maximum(box1[..., :2], box2[..., :2])
    upper = jnp.minimum(box1[..., 2:], box2[..., 2:])
    wh = jnp.clip(upper - lower, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area(box1) + area(box2) - inter
    return inter / union


def shape_iou(wh1, wh2):
    """Anchor-shape IoU: boxes pinned at the origin as corner boxes (0,0,w,h).

    The reference builds (0,0,w,h) "corner" boxes for GT shapes and
    (0,0,aw,ah) for anchors and runs jaccard overlap on them
    (yolo_loss.py:102,127-132) — i.e. inter = min(w,aw)*min(h,ah).
    wh1: (..., n1, 2), wh2: (..., n2, 2) -> (..., n1, n2).
    """
    w1 = wh1[..., :, None, 0]
    h1 = wh1[..., :, None, 1]
    w2 = wh2[..., None, :, 0]
    h2 = wh2[..., None, :, 1]
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union


def enclosing_box(box1, box2):
    """Minimum convex (enclosing) corner box (reference yolo_loss.py:249-256)."""
    l = jnp.minimum(box1[..., 0], box2[..., 0])
    t = jnp.minimum(box1[..., 1], box2[..., 1])
    r = jnp.maximum(box1[..., 2], box2[..., 2])
    b = jnp.maximum(box1[..., 3], box2[..., 3])
    return jnp.stack([l, t, r, b], axis=-1)


def box_ciou(box1, box2):
    """Complete-IoU between aligned corner boxes; returns (ciou, iou).

    Exact reproduction of reference yolo_loss.py:257-293 (`box_ciou` returns
    ``iou - ciou_term``): center-distance over enclosing-box area plus an
    aspect-ratio penalty with alpha weighting. The alpha term is *not*
    detached from the gradient (the reference doesn't detach it either),
    so AdamW trajectories match. If the enclosing box has zero area the
    penalty falls back to plain IoU (degenerate case, yolo_loss.py:286-287).
    """
    c = area(enclosing_box(box1, box2))
    iou = elementwise_iou(box1, box2)

    w1 = box1[..., 2] - box1[..., 0]
    h1 = box1[..., 3] - box1[..., 1]
    w2 = box2[..., 2] - box2[..., 0]
    h2 = box2[..., 3] - box2[..., 1]
    x1 = (box1[..., 2] + box1[..., 0]) / 2
    y1 = (box1[..., 1] + box1[..., 3]) / 2
    x2 = (box2[..., 2] + box2[..., 0]) / 2
    y2 = (box2[..., 1] + box2[..., 3]) / 2

    u = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
    # guard the c==0 division; the degenerate branch overrides the value below
    d = u / jnp.where(c == 0, 1.0, c)

    ar_1 = w2 / h2
    ar_2 = w1 / h1
    atan_diff = jnp.arctan(ar_1) - jnp.arctan(ar_2)
    ar_loss = 4.0 / (math.pi * math.pi) * atan_diff * atan_diff
    alpha = ar_loss / (1.0 - iou + ar_loss + 1e-6)
    ciou_term = d + alpha * ar_loss
    ciou_term = jnp.where(c == 0, iou, ciou_term)
    return iou - ciou_term, iou


def box_giou(box1, box2):
    """Generalized-IoU (reference yolo_loss.py:295-317); returns (giou, iou)."""
    c = area(enclosing_box(box1, box2))
    lower = jnp.maximum(box1[..., :2], box2[..., :2])
    upper = jnp.minimum(box1[..., 2:], box2[..., 2:])
    wh = jnp.clip(upper - lower, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area(box1) + area(box2) - inter
    iou = inter / union
    giou_term = (c - union) / jnp.where(c == 0, 1.0, c)
    giou_term = jnp.where(c == 0, iou, giou_term)
    return iou - giou_term, iou
