"""MobileNetV2-YOLO detector graph (reference models/mbv2_yolo.py:105-173).

Two-scale FPN-lite on the MobileNetV2 taps:

* S32: 1x1 conv 1280->512 + Connect residual + yolo head -> out0
* S16: nearest 2x upsample of the S32 trunk added to a depthwise-projected
  96->512 S16 trunk + Connect + yolo head -> out1
* optional segmentation branch: 96->32 depthwise projection + Connect +
  seg head -> (B, H/16, W/16, seg_classes) raw logits

Pure graph: raw NHWC logits out, no loss/NMS inside (those are ops/).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mobilenet_yolo_tpu.models.layers import (
    Connect,
    ConvBNAct,
    DepthwiseConvolution,
    HeadStack,
    upsample_nearest2x,
)
from mobilenet_yolo_tpu.models.mobilenetv2 import MobileNetV2


class MBv2YOLO(nn.Module):
    num_classes: int = 20
    num_anchors: int = 3
    seg_num_classes: int = 0
    width_mult: float = 1.0
    # channel-pruned backbone widths (prune.py; model-yaml ``prune:`` block)
    backbone_hidden: tuple[int | None, ...] | None = None
    backbone_head: int | None = None
    # rematerialize the backbone blocks in the backward (MobileNetV2.remat)
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        head_ch = self.num_anchors * (5 + self.num_classes)
        c4, c5 = MobileNetV2(width_mult=self.width_mult,
                             hidden_overrides=self.backbone_hidden,
                             head_features=self.backbone_head,
                             remat=self.remat,
                             dtype=self.dtype,
                             name="backbone")(x, train)

        s32 = ConvBNAct(512, 1, dtype=self.dtype, name="conv_for_S32")(c5, train)
        s32 = Connect(512, dtype=self.dtype, name="connect_for_S32")(s32, train)
        out0 = HeadStack(1024, head_ch, dtype=self.dtype, name="yolo_headS32")(s32, train)

        s16 = DepthwiseConvolution(512, dtype=self.dtype, name="conv_for_S16")(c4, train)
        s16 = Connect(512, dtype=self.dtype, name="connect_for_S16")(s16, train)
        s16 = s16 + upsample_nearest2x(s32)
        out1 = HeadStack(512, head_ch, dtype=self.dtype, name="yolo_headS16")(s16, train)

        outputs = {"out0": out0, "out1": out1}
        if self.seg_num_classes > 0:
            seg = DepthwiseConvolution(32, dtype=self.dtype,
                                       name="seg_conv_for_S16")(c4, train)
            seg = Connect(32, dtype=self.dtype, name="seg_connect_for_S16")(seg, train)
            outputs["seg"] = HeadStack(32, self.seg_num_classes, dtype=self.dtype,
                                       name="seg_headS16")(seg, train)
        return outputs
