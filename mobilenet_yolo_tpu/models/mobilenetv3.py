"""MobileNetV3 backbones (flax.linen, NHWC).

Same graphs as reference models/mobilenetv3.py:77-196 — Large: hswish stem,
13-block bneck (tap1, 160 ch, stride 16) + 2-block bneck2 + 1x1 conv to
960 ch (tap2, stride 32). Small: single-tap 576-ch variant.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mobilenet_yolo_tpu.models.layers import ConvBNAct, MBv3Block, hswish

# (kernel, expand, out, act, se, stride) — mobilenetv3.py:84-102
LARGE_STAGE1 = [
    (3, 16, 16, "relu", False, 1),
    (3, 64, 24, "relu", False, 2),
    (3, 72, 24, "relu", False, 1),
    (5, 72, 40, "relu", True, 2),
    (5, 120, 40, "relu", True, 1),
    (5, 120, 40, "relu", True, 1),
    (3, 240, 80, "hswish", False, 2),
    (3, 200, 80, "hswish", False, 1),
    (3, 184, 80, "hswish", False, 1),
    (3, 184, 80, "hswish", False, 1),
    (3, 480, 112, "hswish", True, 1),
    (3, 672, 112, "hswish", True, 1),
    (5, 672, 160, "hswish", True, 1),
]
LARGE_STAGE2 = [
    (5, 672, 160, "hswish", True, 2),
    (5, 960, 160, "hswish", True, 1),
]

# mobilenetv3.py:147-162
SMALL_STAGE1 = [
    (3, 16, 16, "relu", True, 2),
    (3, 72, 24, "relu", False, 2),
    (3, 88, 24, "relu", False, 1),
    (5, 96, 40, "hswish", True, 2),
    (5, 240, 40, "hswish", True, 1),
    (5, 240, 40, "hswish", True, 1),
    (5, 120, 48, "hswish", True, 1),
    (5, 144, 48, "hswish", True, 1),
]
SMALL_STAGE2 = [
    (5, 288, 96, "hswish", True, 2),
    (5, 576, 96, "hswish", True, 1),
    (5, 576, 96, "hswish", True, 1),
]


class MobileNetV3Large(nn.Module):
    """``hidden_overrides``: channel-pruned expansion widths (prune.py),
    indexed bneck0..12 then bneck2_0..1 (stage1 order, then stage2)."""

    hidden_overrides: tuple[int | None, ...] | None = None
    head_features: int | None = None
    # rematerialize each bneck block in the backward (see MobileNetV2.remat)
    remat: bool = False
    dtype: jnp.dtype | None = None

    def _hidden(self, slot: int) -> int | None:
        return (self.hidden_overrides[slot]
                if self.hidden_overrides is not None else None)

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = (nn.remat(MBv3Block, static_argnums=(2,))
                 if self.remat else MBv3Block)
        x = ConvBNAct(16, 3, stride=2, act="hswish", dtype=self.dtype,
                      name="stem")(x, train)
        for i, (k, e, c, act, se, s) in enumerate(LARGE_STAGE1):
            x = Block(k, e, c, act, se, s, dtype=self.dtype,
                      hidden_features=self._hidden(i),
                      name=f"bneck{i}")(x, train)
        c4 = x  # stride 16, 160 ch
        for i, (k, e, c, act, se, s) in enumerate(LARGE_STAGE2):
            x = Block(k, e, c, act, se, s, dtype=self.dtype,
                      hidden_features=self._hidden(len(LARGE_STAGE1) + i),
                      name=f"bneck2_{i}")(x, train)
        x = ConvBNAct(self.head_features or 960, 1, act="none",
                      dtype=self.dtype, name="head_conv")(x, train)
        c5 = hswish(x)  # stride 32, 960 ch
        return c4, c5


class MobileNetV3Small(nn.Module):
    hidden_overrides: tuple[int | None, ...] | None = None
    remat: bool = False
    dtype: jnp.dtype | None = None

    def _hidden(self, slot: int) -> int | None:
        return (self.hidden_overrides[slot]
                if self.hidden_overrides is not None else None)

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = (nn.remat(MBv3Block, static_argnums=(2,))
                 if self.remat else MBv3Block)
        x = ConvBNAct(16, 3, stride=2, act="hswish", dtype=self.dtype,
                      name="stem")(x, train)
        for i, (k, e, c, act, se, s) in enumerate(SMALL_STAGE1):
            x = Block(k, e, c, act, se, s, dtype=self.dtype,
                      hidden_features=self._hidden(i),
                      name=f"bneck{i}")(x, train)
        c4 = x  # stride 16, 48 ch
        for i, (k, e, c, act, se, s) in enumerate(SMALL_STAGE2):
            x = Block(k, e, c, act, se, s, dtype=self.dtype,
                      hidden_features=self._hidden(len(SMALL_STAGE1) + i),
                      name=f"bneck2_{i}")(x, train)
        x = ConvBNAct(576, 1, act="none", dtype=self.dtype, name="head_conv")(x, train)
        c5 = hswish(x)  # stride 32, 576 ch
        return c4, c5
