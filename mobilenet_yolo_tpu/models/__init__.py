"""flax.linen models: MobileNetV2/V3 backbones and YOLO detector graphs.

TPU-first design notes (vs the reference's torch graphs):

* NHWC layout throughout — XLA's native convolution layout on TPU.
* Losses live *outside* the model: ``apply`` returns raw head logits only
  (the reference branches on ``targets is None`` inside forward,
  mbv2_yolo.py:158-166; here ``loss_fn`` / ``decode`` are pure functions).
* BatchNorm is a flax variable collection in training and can be folded
  into conv weights for inference (models/bn_fold.py).
"""

from mobilenet_yolo_tpu.models.mobilenetv2 import MobileNetV2  # noqa: F401
from mobilenet_yolo_tpu.models.mobilenetv3 import (  # noqa: F401
    MobileNetV3Large,
    MobileNetV3Small,
)
from mobilenet_yolo_tpu.models.mbv2_yolo import MBv2YOLO  # noqa: F401
from mobilenet_yolo_tpu.models.mbv3_yolo import MBv3YOLO  # noqa: F401
from mobilenet_yolo_tpu.models.mbv3_yolo_macc import MBv3YOLOMacc  # noqa: F401


def build_model(config: dict, backbone: str = "mbv2", dtype=None):
    """Factory keyed on the model-yaml dict (same contract as reference).

    dtype: compute dtype (e.g. jnp.bfloat16 for mixed precision — params
    stay f32; loss numerics stay f32 via make_loss_fn's output cast).
    """
    num_classes = config["yolo"]["num_classes"]
    num_anchors = config["yolo"]["num_anchors"]
    seg_classes = config.get("seg", {}).get("num_classes", 0)
    # rematerialize backbone blocks in the backward (activation-HBM vs
    # recompute-FLOPs trade; measured in PERF.md "Training throughput")
    remat = bool(config.get("remat", False))
    # channel-pruned widths from tools/prune.py (model yaml 'prune:' block)
    prune_cfg = config.get("prune") or {}
    hidden = prune_cfg.get("backbone_hidden")
    hidden = tuple(hidden) if hidden else None
    head = prune_cfg.get("backbone_head")
    if backbone == "mbv2":
        return MBv2YOLO(num_classes=num_classes, num_anchors=num_anchors,
                        seg_num_classes=seg_classes,
                        backbone_hidden=hidden, backbone_head=head,
                        remat=remat, dtype=dtype)
    if backbone == "mbv3":
        if head is not None:
            raise ValueError("backbone_head is not prunable for mbv3 — its"
                             " consumer is a width-coupled depthwise stack"
                             " (see prune.py)")
        return MBv3YOLO(num_classes=num_classes, num_anchors=num_anchors,
                        backbone_hidden=hidden, remat=remat, dtype=dtype)
    if backbone == "mbv3_macc":
        return MBv3YOLOMacc(num_classes=num_classes, num_anchors=num_anchors,
                            backbone_hidden=hidden, backbone_head=head,
                            remat=remat, dtype=dtype)
    raise ValueError(f"unknown backbone {backbone!r}")
