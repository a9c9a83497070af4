"""End-to-end jitted detection: model forward -> decode -> batched NMS.

This replaces the reference's eval forward path (mbv2_yolo.py:158-166 with
``targets=None`` -> yolo_loss.get_pred_boxes -> utils/box.nms host loop)
with one fused XLA program per input shape. ``val_conf`` is a traced scalar
so the feedback controller (reference train.py:434-440) never triggers a
recompile.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mobilenet_yolo_tpu.ops.anchors import scaled_anchors
from mobilenet_yolo_tpu.ops.decode import decode_predictions, reshape_head
from mobilenet_yolo_tpu.ops.nms import batched_nms


def make_predict_fn(
    model,
    config: dict,
    top_k: int = 256,
    iou_threshold: float = 0.45,
    use_pallas_nms: bool | None = None,
    normalize: bool = False,
    mesh=None,
) -> Callable:
    """Build ``predict(variables, images, val_conf) -> (dets, keep[, seg])``.

    * images: (B, H, W, 3) normalized NHWC batch. With ``normalize=True``
      the fn instead takes raw [0, 255] images (uint8 or float) and applies
      the config's mean/std on device — serving can then ship uint8 over
      the host->device link (4x less transfer than f32).
    * dets:   (B, K, 7) ``(x1,y1,x2,y2,conf,cls_score,cls_idx)`` normalized
    * keep:   (B, K) validity mask
    * seg:    (B, H/16, W/16, seg_classes) sigmoid maps, if the model has a
      segmentation head (reference seg_loss.py:78-81 eval branch)

    With ``mesh`` the program is GSPMD-sharded: the batch dimension splits
    over the ``data`` axis (B must be a multiple of it — the Trainer pads
    eval batches up accordingly), variables/val_conf are replicated and the
    outputs gather back replicated, so the N-chip eval path is the same
    one-liner as single-chip. Under a tensor-parallel mesh (``model`` axis
    > 1) the variables' own placements propagate through a plain jit
    instead, exactly like the train step (train/step.py:_mesh_jit).

    Anchors are re-normalized per live input size, mirroring the reference's
    per-forward ``img_size`` update (mbv2_yolo.py:139-140).
    """
    yolo_cfg = config["yolo"]
    anchors_px = np.asarray(yolo_cfg["anchors"], np.float32)
    masks = [np.asarray(m) for m in yolo_cfg["mask"]]
    num_anchors = int(yolo_cfg["num_anchors"])
    if use_pallas_nms is None:
        # FINAL: the vmapped XLA scan is the NMS implementation. A/B on
        # v5e (batch 128, K=256): XLA wins 19.8 vs 28.4 ms full-pipeline
        # (the per-image Pallas grid serializes what the scan vectorizes
        # across the batch), and the fused forward+decode+NMS program
        # times the SAME as the forward alone — the suppression scan
        # hides under the conv pipeline, so a batched kernel has zero
        # end-to-end headroom to win (PERF.md "What was tried").
        use_pallas_nms = False

    if normalize:
        norm_cfg = config.get("normalize", {"mean": [0.5] * 3, "std": [1.0] * 3})
        norm_mean = np.asarray(norm_cfg["mean"], np.float32)
        norm_std = np.asarray(norm_cfg["std"], np.float32)

    def predict(variables: Any, images: jax.Array, val_conf: jax.Array):
        h, w = images.shape[1], images.shape[2]
        anchors_norm = scaled_anchors(anchors_px, w, h)
        if normalize:
            images = (images.astype(jnp.float32) / 255.0 - norm_mean) / norm_std
        outputs = model.apply(variables, images, train=False)

        flats = []
        for head_key, mask in zip(("out0", "out1"), masks):
            pred = reshape_head(outputs[head_key], num_anchors)
            flats.append(
                decode_predictions(pred, jnp.asarray(anchors_norm[mask]))
            )
        preds = jnp.concatenate(flats, axis=1)
        dets, keep = batched_nms(
            preds, val_conf, top_k=top_k, iou_threshold=iou_threshold,
            use_pallas=use_pallas_nms,
        )
        if "seg" in outputs:
            return dets, keep, jax.nn.sigmoid(outputs["seg"])
        return dets, keep

    if mesh is not None:
        from mobilenet_yolo_tpu.parallel.mesh import (batch_sharding,
                                                      replicated)
        repl = replicated(mesh)
        if mesh.shape.get("model", 1) > 1:
            # tensor-parallel mesh: the variables carry their own (model-
            # axis) placements which must propagate, so only the OUTPUTS
            # are pinned replicated — that makes dets/keep readable on
            # every process of a multi-host run (train/loop.py:evaluate)
            return jax.jit(predict, out_shardings=repl)
        return jax.jit(predict,
                       in_shardings=(repl, batch_sharding(mesh), repl),
                       out_shardings=repl)
    return jax.jit(predict)
