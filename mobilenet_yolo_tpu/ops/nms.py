"""Batched, class-aware hard NMS with fixed shapes.

The reference loops ``batch x num_classes`` on the host and calls
torchvision's C++ NMS per class (utils/box.py:11-31). Here the whole batch
is processed on-device in one jittable call:

1. candidates from both heads are concatenated; validity = ``conf > val_conf``
   (the reference's ragged filter, yolo_loss.py:201-204, becomes a mask)
2. top-K selection by ``conf * cls_score`` keeps shapes static
3. the pairwise suppression matrix (IoU > threshold, same class, lower
   priority) is computed in parallel, then a K-step greedy scan implements
   exact hard NMS — identical box sets to the reference within the top-K
   horizon.

The scan runs either as an XLA ``fori_loop`` (portable) or as a Pallas TPU
kernel (kernels/pallas_nms.py); both are tested for equality.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.boxes import pairwise_iou


def _suppression_matrix(boxes, classes, iou_threshold: float):
    """(K,4), (K,) -> (K,K) float {0,1}: i suppresses j (j strictly later)."""
    k = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)
    same_cls = classes[:, None] == classes[None, :]
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]
    return ((iou > iou_threshold) & same_cls & later).astype(jnp.float32)


def _suppress_scan(over, valid):
    """XLA reference implementation of the greedy scan. (K,K), (K,) -> (K,)."""
    k = over.shape[0]

    def body(i, state):
        suppressed, keep = state
        alive = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(alive)
        suppressed = suppressed | (alive & (over[i] > 0))
        return suppressed, keep

    zeros = jnp.zeros((k,), bool)
    _, keep = jax.lax.fori_loop(0, k, body, (zeros, zeros))
    return keep


@partial(jax.jit, static_argnames=("top_k", "iou_threshold", "use_pallas"))
def batched_nms(preds, val_conf, top_k: int = 256, iou_threshold: float = 0.45,
                use_pallas: bool = False):
    """preds: (B, N, 7) decoded ``(x1,y1,x2,y2,conf,cls_score,cls_idx)``.

    val_conf: scalar confidence gate (traced; changing it never recompiles).
    Returns (detections (B, K, 7), keep_mask (B, K)) with detections sorted
    by descending ``conf * cls_score``.
    """
    conf = preds[..., 4]
    valid = conf > val_conf
    score = preds[..., 4] * preds[..., 5]
    neg_inf = jnp.asarray(-jnp.inf, preds.dtype)
    ranked = jnp.where(valid, score, neg_inf)

    k = min(top_k, preds.shape[1])
    top_scores, top_idx = jax.lax.top_k(ranked, k)             # (B, K)
    sel = jnp.take_along_axis(preds, top_idx[..., None], axis=1)  # (B, K, 7)
    sel_valid = jnp.isfinite(top_scores)

    over = jax.vmap(_suppression_matrix, in_axes=(0, 0, None))(
        sel[..., :4], sel[..., 6].astype(jnp.int32), iou_threshold)

    if use_pallas:
        from mobilenet_yolo_tpu.kernels.pallas_nms import pallas_suppress
        keep = pallas_suppress(over, sel_valid.astype(jnp.float32))
    else:
        keep = jax.vmap(_suppress_scan)(over, sel_valid)
    return sel, keep
