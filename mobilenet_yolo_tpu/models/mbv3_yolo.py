"""MobileNetV3-YOLO detector graph (reference models/mbv3_yolo.py:97-145).

Note: the reference file is broken as shipped (stale ``models.voc.*``
imports, mbv3_yolo.py:5-6); this rebuild fixes that by construction. Graph
semantics follow the reference forward: S32 = depthwise projection
960->320 + Connect + head; S16 = the 160-ch tap run through the *same*
Connect block twice (mbv3_yolo.py:133-134 reuses ``connect_for_S16``), then
merged with the upsampled S32 trunk via channel-partial residual add
(PartAdd: 160 common channels added, the remaining 160 of the 320-ch trunk
concatenated) and a 320-ch head.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mobilenet_yolo_tpu.models.layers import (
    Connect,
    DepthwiseConvolution,
    HeadStack,
    part_add,
    upsample_nearest2x,
)
from mobilenet_yolo_tpu.models.mobilenetv3 import MobileNetV3Large


class MBv3YOLO(nn.Module):
    num_classes: int = 20
    num_anchors: int = 3
    # channel-pruned bneck expansion widths (prune.py); the 960-ch backbone
    # head is NOT prunable here — its consumer is a width-coupled
    # DepthwiseConvolution, unlike MBv2's 1x1 conv
    backbone_hidden: tuple[int | None, ...] | None = None
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        head_ch = self.num_anchors * (5 + self.num_classes)
        c4, c5 = MobileNetV3Large(hidden_overrides=self.backbone_hidden,
                                  remat=self.remat,
                                  dtype=self.dtype, name="backbone")(x, train)

        s32 = DepthwiseConvolution(320, dtype=self.dtype, name="conv_for_S32")(c5, train)
        s32 = Connect(320, dtype=self.dtype, name="connect_for_S32")(s32, train)
        out0 = HeadStack(960, head_ch, dtype=self.dtype, name="yolo_headS32")(s32, train)

        connect_s16 = Connect(160, dtype=self.dtype, name="connect_for_S16")
        s16 = connect_s16(c4, train)
        s16 = connect_s16(s16, train)  # applied twice, as in the reference
        s16 = part_add(s16, upsample_nearest2x(s32))  # -> 320 ch
        out1 = HeadStack(640, head_ch, dtype=self.dtype, name="yolo_headS16")(s16, train)
        return {"out0": out0, "out1": out1}
