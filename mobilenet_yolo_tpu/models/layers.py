"""Shared conv building blocks (flax.linen, NHWC).

Counterparts of the reference's torch blocks:

* ``ConvBNAct``       — BasicConv (mbv2_yolo.py:16-44) / conv_3x3_bn,
                        conv_1x1_bn (mobilenetv2.py:38-51)
* ``InvertedResidual``— mobilenetv2.py:54-91
* ``SEModule``        — mobilenetv3.py:26-41
* ``MBv3Block``       — mobilenetv3.py:44-74
* ``Connect``         — residual refinement block, mbv2_yolo.py:93-104
* ``DepthwiseConvolution`` / ``yolo_head`` / ``seg_head`` —
                        mbv2_yolo.py:70-92
* ``upsample_nearest2x`` — mbv2_yolo.py:46-57
* ``part_add``        — channel-partial residual merge, mbv2_yolo.py:58-69

Depthwise convs use ``feature_group_count`` so XLA lowers them to the TPU
depthwise path; weight init is kaiming-style fan-out to match the
reference's ``init.kaiming_normal_(mode='fan_out')``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import flax.linen as nn

# torch BatchNorm2d defaults: eps 1e-5, running-stat momentum 0.1
BN_MOMENTUM = 0.9  # flax momentum = fraction of the *old* running stat
BN_EPS = 1e-5

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def hswish(x):
    """x * relu6(x + 3) / 6 (reference mobilenetv3.py:14-17)."""
    return x * relu6(x + 3.0) * (1.0 / 6.0)


def hsigmoid(x):
    """relu6(x + 3) / 6 (reference mobilenetv3.py:20-23)."""
    return relu6(x + 3.0) * (1.0 / 6.0)


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


ACTIVATIONS: dict[str, Callable] = {
    "relu6": relu6,
    "relu": nn.relu,
    "leaky": leaky_relu,
    "hswish": hswish,
    "none": lambda x: x,
}


class ConvBNAct(nn.Module):
    """conv (no bias) -> batchnorm -> activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False
    act: str = "leaky"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=groups,
            use_bias=False,
            kernel_init=kaiming_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return ACTIVATIONS[self.act](x)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual bottleneck (mobilenetv2.py:54-91).

    ``hidden_features`` overrides the expansion width (default
    ``round(inp * expand_ratio)``) — the seam channel pruning uses to
    rebuild a slimmed graph (prune.py); only meaningful when
    ``expand_ratio != 1`` (otherwise there is no expand conv and the
    hidden width IS the input width).
    """

    features: int
    stride: int
    expand_ratio: int
    hidden_features: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = self.hidden_features or round(inp * self.expand_ratio)
        identity = self.stride == 1 and inp == self.features

        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, 1, act="relu6", dtype=self.dtype, name="expand")(y, train)
        y = ConvBNAct(hidden, 3, stride=self.stride, depthwise=True,
                      act="relu6", dtype=self.dtype, name="depthwise")(y, train)
        y = ConvBNAct(self.features, 1, act="none", dtype=self.dtype, name="project")(y, train)
        return x + y if identity else y


class SEModule(nn.Module):
    """Squeeze-excite with hsigmoid gate (mobilenetv3.py:26-41)."""

    reduction: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = ConvBNAct(ch // self.reduction, 1, act="relu", dtype=self.dtype, name="fc1")(s, train)
        s = ConvBNAct(ch, 1, act="none", dtype=self.dtype, name="fc2")(s, train)
        return x * hsigmoid(s)


class MBv3Block(nn.Module):
    """MobileNetV3 bneck: expand + depthwise + pointwise (+SE) with the
    reference's unusual shortcut: a 1x1 conv-bn shortcut when stride==1 and
    channels change (mobilenetv3.py:60-73).

    ``hidden_features`` overrides the expansion width (channel pruning,
    prune.py) — the SE module gates the *project* output, so slimming the
    hidden channels never touches it.
    """

    kernel: int
    expand: int
    features: int
    act: str
    use_se: bool
    stride: int
    hidden_features: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = self.hidden_features or self.expand
        y = ConvBNAct(hidden, 1, act=self.act, dtype=self.dtype, name="expand")(x, train)
        y = ConvBNAct(hidden, self.kernel, stride=self.stride, depthwise=True,
                      act=self.act, dtype=self.dtype, name="depthwise")(y, train)
        y = ConvBNAct(self.features, 1, act="none", dtype=self.dtype, name="project")(y, train)
        if self.use_se:
            y = SEModule(dtype=self.dtype, name="se")(y, train)
        if self.stride == 1:
            sc = x
            if inp != self.features:
                sc = ConvBNAct(self.features, 1, act="none", dtype=self.dtype,
                               name="shortcut")(x, train)
            y = y + sc
        return y


class Connect(nn.Module):
    """x + convs(x) residual refinement (mbv2_yolo.py:93-104)."""

    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(self.channels, 3, depthwise=True, dtype=self.dtype, name="dw")(x, train)
        y = ConvBNAct(self.channels, 1, dtype=self.dtype, name="pw")(y, train)
        return x + y


class DepthwiseConvolution(nn.Module):
    """dw3x3 -> pw1x1 (same ch) -> pw1x1 (out ch) (mbv2_yolo.py:70-76)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1]
        x = ConvBNAct(ch, 3, depthwise=True, dtype=self.dtype, name="dw")(x, train)
        x = ConvBNAct(ch, 1, dtype=self.dtype, name="pw1")(x, train)
        x = ConvBNAct(self.features, 1, dtype=self.dtype, name="pw2")(x, train)
        return x


class HeadStack(nn.Module):
    """dw3x3 -> pw1x1 -> pw1x1(mid) -> 1x1 conv w/ bias to raw outputs
    (yolo_head / seg_head, mbv2_yolo.py:77-92)."""

    mid: int
    out: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1]
        x = ConvBNAct(ch, 3, depthwise=True, dtype=self.dtype, name="dw")(x, train)
        x = ConvBNAct(ch, 1, dtype=self.dtype, name="pw1")(x, train)
        x = ConvBNAct(self.mid, 1, dtype=self.dtype, name="pw2")(x, train)
        # small-std init on the raw-output conv: kaiming fan_out here gives
        # ~N(0, 8) logits (std sqrt(2/27) x sqrt(1024 inputs)), which sends
        # exp(t_wh) to ~1e10 boxes at step 0 and destabilises the CIoU
        # backward; N(0, 0.01) starts decode near identity instead
        x = nn.Conv(self.out, (1, 1), use_bias=True,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="out")(x)
        return x


def upsample_nearest2x(x):
    """Nearest-neighbour 2x upsample (mbv2_yolo.py:46-57) without gathers:
    broadcast + reshape lowers to a cheap layout op on TPU."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def part_add(x, y):
    """Channel-partial residual add (mbv2_yolo.py:58-69): add the common
    channel prefix, concat the leftover channels of the wider input."""
    cx, cy = x.shape[-1], y.shape[-1]
    if cx == cy:
        return x + y
    n = min(cx, cy)
    merged = x[..., :n] + y[..., :n]
    rest = y[..., n:] if cy > cx else x[..., n:]
    return jnp.concatenate([merged, rest], axis=-1)


def make_divisible(v, divisor, min_value=None):
    """Channel rounding (reference mobilenetv2.py:18-35)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v
