"""Fused inverted-residual Pallas kernel (inference).

A stride-1 MobileNetV2 bottleneck materialises its 6x-expanded hidden
activation in HBM three times (expand write, depthwise read+write, project
read) — the dominant bandwidth cost of the early high-resolution blocks of
the ~10ms single-chip forward at batch 128, 352x352. This kernel keeps the
hidden tensor entirely in VMEM:

    x_tile -> 1x1 expand (MXU) -> ReLU6 -> 3x3 depthwise (9 rolled VPU
    FMAs) -> ReLU6 -> 1x1 project (MXU) [-> + residual] -> out_tile

BatchNorms must be pre-folded into the conv weights/biases by the caller
(see models/bn_fold.py for the folding math), so the kernel sees plain
conv+bias. Status: numerically exact vs XLA (tests/test_pallas_fused.py)
but NOT wired into the model forward — measured slower than XLA's convs
on the current toolchain (PERF.md "What was tried"); kept as a tested
starting point for future toolchains.

Layout/tiling notes (v5e):
* grid over (batch, row-tiles); the input row window overlaps (TH+2 rows
  per TH-row output tile), which BlockSpecs can't express, so the input
  stays in HBM and each program DMAs its window into scratch.
* the width axis is the sublane dim: padded to a multiple of 8 so the DMA
  slice is tile-aligned; the 3x3 depthwise uses ``pltpu.roll`` on that axis
  (wrap-around terms land on masked-to-zero padding columns).
* the unfused op zero-pads the *hidden* tensor into the depthwise conv, so
  the kernel masks the padding ring after the (bias-carrying) expansion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _fused_block_kernel(xa_ref, xb_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                        w2_ref, b2_ref, out_ref, *, th: int, height: int,
                        width: int, residual: bool):
    t = pl.program_id(1)
    _, _, wp, cin = xa_ref.shape        # (1, TH, Wp, Cin)
    tr = th + 2
    ch = w1_ref.shape[1]

    # rows [t*th, t*th+th) + 2 halo rows from the next row-block
    x = jnp.concatenate([xa_ref[0], xb_ref[0, :2]], axis=0)  # (TH+2, Wp, Cin)

    # 1x1 expand on the MXU + folded-BN bias + ReLU6
    h = jnp.dot(x.reshape(tr * wp, cin), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    # stays f32: tpu.dynamic_rotate (roll) has no sub-32-bit lowering
    h = jnp.clip(h, 0.0, 6.0).reshape(tr, wp, ch)

    # zero the padding ring (incl. width-alignment columns) so the depthwise
    # sees a zero-padded hidden tensor, as the unfused op does
    grow = t * th + jax.lax.broadcasted_iota(jnp.int32, (tr, wp, 1), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tr, wp, 1), 1)
    interior = ((grow > 0) & (grow < height + 1)
                & (gcol > 0) & (gcol < width + 1))
    h = h * interior.astype(h.dtype)

    # 3x3 depthwise: row slices are free (dim 0 is untiled); column shifts
    # via roll on the sublane axis — wrap terms hit zeroed padding columns
    acc = jnp.zeros((th, wp, ch), jnp.float32)
    for di in range(3):
        rows = h[di:di + th]
        for dj in range(3):
            shifted = pltpu.roll(rows, (1 - dj) % wp, 1)  # roll needs shift>=0
            acc = acc + shifted * wdw_ref[di * 3 + dj, :].astype(jnp.float32)
    acc = acc + bdw_ref[:]
    d = jnp.clip(acc, 0.0, 6.0).astype(x.dtype)

    # 1x1 linear project on the MXU
    cout = w2_ref.shape[1]
    o = jnp.dot(d.reshape(th * wp, ch), w2_ref[:],
                preferred_element_type=jnp.float32)
    o = (o + b2_ref[:]).reshape(th, wp, cout)
    if residual:
        o = o + x[1:1 + th].astype(jnp.float32)
    out_ref[0] = o.astype(out_ref.dtype)


def _pick_tile_rows(h: int, cap: int = 24) -> int:
    """Largest divisor of h not exceeding cap (keeps VMEM tiles bounded)."""
    for d in range(min(h, cap), 0, -1):
        if h % d == 0:
            return d
    return 1


@functools.partial(
    jax.jit, static_argnames=("residual", "tile_rows", "interpret"))
def fused_inverted_residual(x, w1, b1, wdw, bdw, w2, b2,
                            residual: bool = True, tile_rows: int | None = None,
                            interpret: bool = False):
    """Stride-1 inverted residual: x (B,H,W,Cin) -> (B,H,W,Cout).

    w1 (Cin,Ch), wdw (3,3,Ch), w2 (Ch,Cout); per-conv biases (BN folded).
    tile_rows must divide H (auto-selected when None).
    """
    b, h, w, cin = x.shape
    ch = w1.shape[1]
    cout = w2.shape[1]
    th = tile_rows if tile_rows else _pick_tile_rows(h)
    assert h % th == 0, (h, th)
    n_tiles = h // th

    wp = _round_up(w + 2, 8)
    # rows: 1 top pad + (th-1) bottom pad so every tile's next row-block
    # exists ((n_tiles+1) blocks of th rows); cols: 1 left + align-fill right
    xp = jnp.pad(x, ((0, 0), (1, th - 1), (1, wp - w - 1), (0, 0)))
    wdw_flat = wdw.reshape(9, ch)
    b1 = b1.reshape(1, ch)
    bdw = bdw.reshape(1, 1, ch)
    b2 = b2.reshape(1, cout)

    kernel = functools.partial(_fused_block_kernel, th=th, height=h,
                               width=w, residual=residual)
    row_block = pl.BlockSpec((1, th, wp, cin), lambda b_, t: (b_, t, 0, 0),
                             memory_space=pltpu.VMEM)
    halo_block = pl.BlockSpec((1, th, wp, cin), lambda b_, t: (b_, t + 1, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            row_block,                                  # x rows
            halo_block,                                 # next row-block (halo)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wdw
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bdw
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
        ],
        out_specs=pl.BlockSpec((1, th, wp, cout), lambda b_, t: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, cout), x.dtype),
        interpret=interpret,
    )(xp, xp, w1, b1, wdw_flat, bdw, w2, b2)
    return out[:, :, 1:w + 1, :]


def _fused_block_s2_kernel(xa_ref, xb_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                           w2_ref, b2_ref, out_ref, h_ref, *, tho: int,
                           hin: int, win: int):
    """Stride-2 variant: output tile THo rows from 2*THo+1 input rows."""
    t = pl.program_id(1)
    _, _, wip, cin = xa_ref.shape       # input row-blocks of 2*THo rows
    tr = 2 * tho + 1
    ch = w1_ref.shape[1]
    wop = out_ref.shape[2]

    x = jnp.concatenate([xa_ref[0], xb_ref[0, :1]], axis=0)  # (TR, WIP, Cin)

    h = jnp.dot(x.reshape(tr * wip, cin), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = jnp.clip(h, 0.0, 6.0).reshape(tr, wip, ch)

    grow = t * 2 * tho + jax.lax.broadcasted_iota(jnp.int32, (tr, wip, 1), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tr, wip, 1), 1)
    interior = ((grow > 0) & (grow < hin + 1)
                & (gcol > 0) & (gcol < win + 1))
    # stride-2 windows aren't expressible on vector values (Mosaic confines
    # value-slice strides to 1), so stage h in VMEM and use strided loads
    h_ref[:] = h * interior.astype(h.dtype)

    acc = jnp.zeros((tho, wop, ch), jnp.float32)
    for di in range(3):
        for dj in range(3):
            term = h_ref[di:di + 2 * tho - 1:2, dj:dj + 2 * wop - 1:2, :]
            acc = acc + term * wdw_ref[di * 3 + dj, :].astype(jnp.float32)
    acc = acc + bdw_ref[:]
    d = jnp.clip(acc, 0.0, 6.0).astype(x.dtype)

    cout = w2_ref.shape[1]
    o = jnp.dot(d.reshape(tho * wop, ch), w2_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[0] = (o + b2_ref[:]).reshape(tho, wop, cout).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_inverted_residual_s2(x, w1, b1, wdw, bdw, w2, b2,
                               tile_rows: int | None = None,
                               interpret: bool = False):
    """Stride-2 inverted residual: x (B,H,W,Cin) -> (B,H/2,W/2,Cout).

    Same fusion as the stride-1 kernel; the depthwise uses strided
    (2,2) lax.slice windows. No residual (stride-2 is never identity).
    H, W must be even.
    """
    b, hin, win, cin = x.shape
    assert hin % 2 == 0 and win % 2 == 0
    ho, wo = hin // 2, win // 2
    ch = w1.shape[1]
    cout = w2.shape[1]
    tho = tile_rows if tile_rows else _pick_tile_rows(ho, 16)
    n_tiles = ho // tho

    wop = _round_up(wo, 8)              # padded out width (aligned)
    wip = _round_up(2 * wop + 3, 8)     # slices need dj + 2*wop - 1 <= wip
    # rows: 1 top pad; bottom pad so (n_tiles+1) input row-blocks exist
    row_pad = (n_tiles + 1) * 2 * tho - hin - 1
    xp = jnp.pad(x, ((0, 0), (1, row_pad), (1, wip - win - 1), (0, 0)))
    wdw_flat = wdw.reshape(9, ch)
    b1 = b1.reshape(1, ch)
    bdw = bdw.reshape(1, 1, ch)
    b2 = b2.reshape(1, cout)

    kernel = functools.partial(_fused_block_s2_kernel, tho=tho, hin=hin,
                               win=win)
    row_block = pl.BlockSpec((1, 2 * tho, wip, cin),
                             lambda b_, t: (b_, t, 0, 0),
                             memory_space=pltpu.VMEM)
    halo_block = pl.BlockSpec((1, 2 * tho, wip, cin),
                              lambda b_, t: (b_, t + 1, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[row_block, halo_block] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, tho, wop, cout),
                               lambda b_, t: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wop, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((2 * tho + 1, wip, ch), jnp.float32)],
        interpret=interpret,
    )(xp, xp, w1, b1, wdw_flat, bdw, w2, b2)
    return out[:, :, :wo, :]


def xla_inverted_residual(x, w1, b1, wdw, bdw, w2, b2, residual=True,
                          stride=1):
    """XLA reference implementation (for testing and fallback)."""
    h = jax.lax.conv_general_dilated(
        x, w1[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b1
    h = jnp.clip(h, 0, 6).astype(x.dtype)
    ch = wdw.shape[-1]
    d = jax.lax.conv_general_dilated(
        h, wdw[:, :, None, :], (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ch,
        preferred_element_type=jnp.float32) + bdw
    d = jnp.clip(d, 0, 6).astype(x.dtype)
    o = jax.lax.conv_general_dilated(
        d, w2[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b2
    if residual:
        o = o + x.astype(jnp.float32)
    return o.astype(x.dtype)


# ------------------------------------------------------- fused s2d stem --
#
# The 3x3/s2 RGB stem is the single most expensive stage of the forward
# (~2.2 ms of 10.3 at batch 128/352², PERF.md): K=27 against 128 MXU lanes
# and a strided window walk over the largest activation. Folding the
# stride into a space-to-depth relayout makes every op stride-1: on the
# (H/2, W/2, 12) block grid the stem becomes FOUR shifted K=12 matmuls
# (output block (i,j) reads input blocks (i-1..i, j-1..j) for the
# reference's pad-1 convention), which chain into block0's stride-1
# depthwise + linear project (expand_ratio=1, mobilenetv2.py:54-91) inside
# one kernel — the hidden 32-channel tensor never touches HBM.
#
# Status: numerically exact vs the folded model (tests), but measured
# 15.8 ms vs XLA's 3.0 ms for the same chain at batch 128/352² bf16
# (PERF.md "What was tried"); larger tiles hit scoped-VMEM OOM. Unwired —
# XLA keeps the stem on this toolchain.

def _fused_stem_kernel(xa_ref, xb_ref, w4_ref, b1_ref, wdw_ref, bdw_ref,
                       w2_ref, b2_ref, out_ref, *, th: int, height: int,
                       width: int):
    t = pl.program_id(1)
    _, _, wp, cin = xa_ref.shape        # (1, TH, Wp, 12)
    tr = th + 2
    ch = w4_ref.shape[2]

    # xp rows [t*th, t*th+th+3): hidden_padded row r needs blocks r, r+1.
    # f32 staging: tpu.dynamic_rotate (roll) has no sub-32-bit lowering
    x = jnp.concatenate([xa_ref[0], xb_ref[0, :3]], axis=0
                        ).astype(jnp.float32)

    # stem as 4 shifted matmuls over the halo'd tile (MXU, K=12)
    acc = jnp.zeros((tr * wp, ch), jnp.float32)
    for bi in range(2):
        rows = x[bi:bi + tr]
        for bj in range(2):
            shifted = rows if bj == 0 else pltpu.roll(rows, wp - bj, 1)
            acc = acc + jnp.dot(shifted.reshape(tr * wp, cin),
                                w4_ref[bi * 2 + bj].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
    h = jnp.clip(acc + b1_ref[:], 0.0, 6.0).reshape(tr, wp, ch)

    # zero the dw padding ring + alignment columns (hidden_padded coords)
    grow = t * th + jax.lax.broadcasted_iota(jnp.int32, (tr, wp, 1), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tr, wp, 1), 1)
    interior = ((grow > 0) & (grow < height + 1)
                & (gcol > 0) & (gcol < width + 1))
    h = h * interior.astype(h.dtype)

    # block0 depthwise 3x3/s1 (9 rolled VPU FMAs) + ReLU6
    acc = jnp.zeros((th, wp, ch), jnp.float32)
    for di in range(3):
        rows = h[di:di + th]
        for dj in range(3):
            shifted = pltpu.roll(rows, (1 - dj) % wp, 1)
            acc = acc + shifted * wdw_ref[di * 3 + dj, :].astype(jnp.float32)
    acc = acc + bdw_ref[:]
    d = jnp.clip(acc, 0.0, 6.0)

    # block0 linear project (MXU)
    cout = w2_ref.shape[1]
    o = jnp.dot(d.reshape(th * wp, ch).astype(w2_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[0] = (o + b2_ref[:]).reshape(th, wp, cout).astype(out_ref.dtype)


def _stem_w4(k_stem: jax.Array) -> jax.Array:
    """(4, 12, 32) block-space stem weights from the (3, 3, 3, C) kernel.

    s2d channel order is (dy, dx, c) -> dy*6 + dx*3 + c; output block
    (i, j) tap (bi, bj) reads input block (i-1+bi, j-1+bj), so original
    kernel tap (ky, kx) = (2*bi + dy - 1, 2*bj + dx - 1) (the reference
    pads 1 on each side, layers.py:79). Out-of-range taps are zero.
    """
    cout = k_stem.shape[-1]
    w4 = jnp.zeros((4, 12, cout), k_stem.dtype)
    for bi in range(2):
        for bj in range(2):
            for dy in range(2):
                for dx in range(2):
                    ky, kx = 2 * bi + dy - 1, 2 * bj + dx - 1
                    if 0 <= ky < 3 and 0 <= kx < 3:
                        w4 = w4.at[bi * 2 + bj,
                                   dy * 6 + dx * 3:dy * 6 + dx * 3 + 3].set(
                            k_stem[ky, kx])
    return w4


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def fused_stem_block0(x, k_stem, b_stem, wdw, bdw, w2, b2,
                      tile_rows: int | None = None,
                      interpret: bool = False):
    """Fused stem (3x3/s2) + block0 (dw3x3/s1 + 1x1 project), BN folded.

    x (B, H, W, 3) -> (B, H/2, W/2, Cout); k_stem (3, 3, 3, Ch);
    wdw (3, 3, Ch); w2 (Ch, Cout). H, W must be even.
    """
    b, hin, win, _ = x.shape
    ho, wo = hin // 2, win // 2
    ch = k_stem.shape[-1]
    cout = w2.shape[1]
    th = tile_rows if tile_rows else _pick_tile_rows(ho, 16)
    n_tiles = ho // th

    # space-to-depth: (B, H/2, W/2, 12), channel = dy*6 + dx*3 + c
    xb = x.reshape(b, ho, 2, wo, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, ho, wo, 12)

    wp = _round_up(wo + 3, 8)
    row_pad = (n_tiles + 1) * th - ho - 2
    xp = jnp.pad(xb, ((0, 0), (2, row_pad), (2, wp - wo - 2), (0, 0)))
    w4 = _stem_w4(k_stem)
    wdw_flat = wdw.reshape(9, ch)
    b1 = b_stem.reshape(1, ch)
    bdw = bdw.reshape(1, 1, ch)
    b2 = b2.reshape(1, cout)

    kernel = functools.partial(_fused_stem_kernel, th=th, height=ho,
                               width=wo)
    row_block = pl.BlockSpec((1, th, wp, 12), lambda b_, t: (b_, t, 0, 0),
                             memory_space=pltpu.VMEM)
    halo_block = pl.BlockSpec((1, th, wp, 12), lambda b_, t: (b_, t + 1, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[row_block, halo_block] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, th, wp, cout), lambda b_, t: (b_, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wp, cout), x.dtype),
        interpret=interpret,
    )(xp, xp, w4, b1, wdw_flat, bdw, w2, b2)
    return out[:, :, 1:wo + 1, :]


def xla_stem_block0(x, k_stem, b_stem, wdw, bdw, w2, b2):
    """XLA reference: stem conv3x3/s2(pad 1) + ReLU6 + block0 (for tests
    and the honest A/B)."""
    h = jax.lax.conv_general_dilated(
        x, k_stem, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b_stem
    h = jnp.clip(h, 0, 6).astype(x.dtype)
    return xla_inverted_residual(
        h, jnp.eye(h.shape[-1], dtype=h.dtype), jnp.zeros((h.shape[-1],)),
        wdw, bdw, w2, b2, residual=False, stride=1)
