"""MobileNetV3-YOLO MACC-lite graph (reference models/mbv3_yolo_macc.py:97-137).

A loss-free raw-head-output graph used for MACC counting / graph export
(the reference wires it to a commented ``writer.add_graph``,
train.py:123-125). MACC trick: the upsample path applies a 512->256 1x1
conv *before* the 2x nearest upsample (mbv3_yolo_macc.py:45-56,112), so the
pointwise conv runs at the low resolution.
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
from mobilenet_yolo_tpu.models.mobilenetv3 import MobileNetV3Large


class MBv3YOLOMacc(nn.Module):
    num_classes: int = 20
    num_anchors: int = 3
    # channel-pruned widths (prune.py); the 960-ch backbone head IS
    # prunable here (its consumer is a plain 1x1 ConvBNAct, unlike
    # MBv3YOLO's width-coupled DepthwiseConvolution)
    backbone_hidden: tuple[int | None, ...] | None = None
    backbone_head: int | None = None
    remat: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        head_ch = self.num_anchors * (5 + self.num_classes)
        c4, c5 = MobileNetV3Large(hidden_overrides=self.backbone_hidden,
                                  head_features=self.backbone_head,
                                  remat=self.remat,
                                  dtype=self.dtype, name="backbone")(x, train)

        s32 = ConvBNAct(512, 1, dtype=self.dtype, name="conv_for_S32")(c5, train)
        s32 = Connect(512, dtype=self.dtype, name="connect_for_S32")(s32, train)
        out0 = HeadStack(1024, head_ch, dtype=self.dtype, name="yolo_headS32")(s32, train)

        # conv-then-upsample to cut MACCs
        up = ConvBNAct(256, 1, dtype=self.dtype, name="upsample_conv")(s32, train)
        up = upsample_nearest2x(up)
        s16 = DepthwiseConvolution(256, dtype=self.dtype, name="conv_for_S16")(c4, train)
        s16 = s16 + up
        s16 = Connect(256, dtype=self.dtype, name="connect_for_S16")(s16, train)
        out1 = HeadStack(512, head_ch, dtype=self.dtype, name="yolo_headS16")(s16, train)
        return {"out0": out0, "out1": out1}
