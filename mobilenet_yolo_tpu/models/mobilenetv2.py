"""MobileNetV2 backbone (flax.linen, NHWC).

Same graph as the reference models/mobilenetv2.py:94-144: a 3x3/2 stem,
inverted-residual stages split into ``features`` (cfgs1, ends at 96 ch,
stride 16) and ``features2`` (cfgs2) + a 1x1 conv to 1280 ch (stride 32).
``__call__`` returns both taps ``(C4 stride-16, C5 stride-32)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mobilenet_yolo_tpu.models.layers import ConvBNAct, InvertedResidual, make_divisible

# (expand_ratio t, channels c, repeats n, stride s) — mobilenetv2.py:98-110
CFGS_STAGE1 = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
]
CFGS_STAGE2 = [
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    """``hidden_overrides`` / ``head_features`` carry channel-pruned widths
    (prune.py): per-block expansion sizes (None entries keep the default
    ``round(inp * t)``) and the final 1x1 head-conv width (default 1280).
    """

    width_mult: float = 1.0
    hidden_overrides: tuple[int | None, ...] | None = None
    head_features: int | None = None
    # rematerialize each inverted-residual block in the backward pass
    # (jax.checkpoint via nn.remat): the 6x-expanded hidden activations are
    # recomputed instead of stored, trading FLOPs for activation HBM.
    # Param tree and forward numerics are identical (tests/test_remat.py).
    remat: bool = False
    dtype: jnp.dtype | None = None

    def _hidden(self, idx: int) -> int | None:
        if self.hidden_overrides is None:
            return None
        return self.hidden_overrides[idx]

    @nn.compact
    def __call__(self, x, train: bool = False):
        # static_argnums=(2,): (module, x, train) — ``train`` is a Python
        # bool branching the BN graph, so it must stay trace-static
        Block = (nn.remat(InvertedResidual, static_argnums=(2,))
                 if self.remat else InvertedResidual)
        wm = self.width_mult
        div = 4 if wm == 0.1 else 8
        stem_ch = make_divisible(32 * wm, div)
        x = ConvBNAct(stem_ch, 3, stride=2, act="relu6", dtype=self.dtype,
                      name="stem")(x, train)

        idx = 0
        for t, c, n, s in CFGS_STAGE1:
            out_ch = make_divisible(c * wm, div)
            for i in range(n):
                x = Block(out_ch, s if i == 0 else 1, t,
                          hidden_features=self._hidden(idx),
                          dtype=self.dtype, name=f"block{idx}")(x, train)
                idx += 1
        c4 = x  # stride 16, 96 ch

        for t, c, n, s in CFGS_STAGE2:
            out_ch = make_divisible(c * wm, div)
            for i in range(n):
                x = Block(out_ch, s if i == 0 else 1, t,
                          hidden_features=self._hidden(idx),
                          dtype=self.dtype, name=f"block{idx}")(x, train)
                idx += 1
        head_ch = self.head_features or (
            make_divisible(1280 * wm, div) if wm > 1.0 else 1280)
        c5 = ConvBNAct(head_ch, 1, act="relu6", dtype=self.dtype,
                       name="head_conv")(x, train)  # stride 32, 1280 ch
        return c4, c5
