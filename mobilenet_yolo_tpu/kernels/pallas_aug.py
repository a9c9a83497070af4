"""Fused Pallas kernel for the per-slot pixel augmentation stages.

The device-geometry train step's pre-forward stages (PERF.md) spend most of
their time streaming the staged slots (B, 4, S, S, 3) through HBM again and
again: ``slot_noise`` is one read+write pass, and ``planned_color_jitter``
is ~9 more (two 4-step select phases around the hue pass — each fori_loop
iteration is a full-memory-bandwidth pass even when every program slot is
identity, because XLA cannot skip data-dependent work).

This kernel fuses BOTH stages into a single HBM read + write per slot: one
grid program per staged source loads the (3, S, S) planar image into VMEM
once, draws the additive-noise gaussians with the on-core PRNG, then walks
the 5-step host-planned photometric program with ``lax.switch`` — real
scalar branching, so each op (including hue's HSV round-trip, which forced
the XLA formulation to split its program) only executes when the plan
actually selected it. All math is the same f32 arithmetic as
``ops/device_augment.py`` (reference semantics: utils/
image_augmentation.py:169-198 photometric with per-image op order,
folder2lmdb.py:29-42 additive noise); parity is pinned by
tests/test_pallas_aug.py (interpret mode == XLA ops).

Layout: channels-last staging tiles (S, S, 3) put the 3-wide channel axis
on the 128-lane minor dimension, wasting 42x of every vector register, so
the caller transposes to planar (N, 3, S, S) first (a cheap XLA uint8 pass)
and the composition step (ops/device_augment.py:geometric_compose
``planar=True``) consumes the planar slots directly.

Noise RNG: ``pltpu.prng_random_bits`` + Box-Muller, seeded per (call seed,
slot index) — deterministic for checkpoint-resume lockstep like the XLA
path's keyed draw, but a different stream (augmentation noise needs bulk
statistical quality, not cross-implementation bit equality; the XLA path
already switched generators once for the same reason, unsafe_rbg).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _bits_to_unit(bits):
    """uint32 -> uniform f32 in (0, 1]: 24-bit mantissa, never 0 (safe for
    log). The f32 convert is staged through int32 (top 24 bits are always
    non-negative) — Mosaic has no unsigned->float lowering."""
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0) + (1.0 / 33554432.0)


def _luma(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b


def _noised(x, gate, scale, pc, bits=None):
    """Additive gaussian noise on one (3, S, S) f32 slot (S even).

    Half-size draws: each Box-Muller pair yields TWO independent normals
    (r*cos, r*sin) — halves the PRNG words and the log/sqrt
    transcendentals, which dominate the kernel's VPU time. The caller
    must have seeded the per-slot stream (pltpu.prng_seed) unless
    ``bits`` (2, 3, S//2, S) uint32 are injected (CPU tests)."""
    def draw(x):
        c, s_h, s_w = x.shape
        half = (c, s_h // 2, s_w)
        if bits is not None:
            b1, b2 = bits
        else:
            b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
            b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
        u1 = _bits_to_unit(b1)
        u2 = _bits_to_unit(b2)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        z = jnp.concatenate([r * jnp.cos(_TWO_PI * u2),
                             r * jnp.sin(_TWO_PI * u2)], axis=1)
        # per-channel draw with p=0.3; else one shared plane (channel 0 of
        # the field doubles as the plane, like the XLA path's slot_noise)
        z = jnp.where(pc != 0, z, z[0:1])
        return jnp.clip(x + z * scale, 0.0, 255.0)

    return jax.lax.cond(gate != 0, draw, lambda x: x, x)


# ---- host-planned photometric program ops (reference semantics:
# utils/image_augmentation.py:169-198; same f32 math as
# ops/device_augment.planned_color_jitter) --------------------------------

def _brightness(x, f):
    return jnp.clip(x * f, 0.0, 255.0)


def _contrast(x, f):
    m = jnp.mean(_luma(x[0], x[1], x[2]))
    return jnp.clip(m + f * (x - m), 0.0, 255.0)


def _saturation(x, f):
    gray = _luma(x[0], x[1], x[2])[None]
    return jnp.clip(gray + f * (x - gray), 0.0, 255.0)


def _hue(x, f):
    r, g, b = x[0] / 255.0, x[1] / 255.0, x[2] / 255.0
    mx = jnp.maximum(r, jnp.maximum(g, b))
    mn = jnp.minimum(r, jnp.minimum(g, b))
    diff = mx - mn
    safe = jnp.where(diff == 0.0, 1.0, diff)
    h = jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(diff == 0.0, 0.0, h) / 6.0
    s = jnp.where(mx == 0.0, 0.0, diff / jnp.where(mx == 0.0, 1.0, mx))
    h = (h + f) % 1.0

    def chan(c):
        k = (c + h * 6.0) % 6.0
        return mx - mx * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
    out = jnp.stack([chan(5.0), chan(3.0), chan(1.0)])
    return jnp.clip(out * 255.0, 0.0, 255.0)


def _gamma(x, f):
    return jnp.clip((x / 255.0) ** f * 255.0, 0.0, 255.0)


def _identity(x, f):
    return x


def _walk_program(x, read_op, n_steps: int):
    """Apply the host-planned photometric program: ``read_op(t)`` yields
    (op id, factor) for step t; lax.switch gives real scalar branching so
    each op (including hue's HSV round-trip) only executes when the plan
    selected it."""
    def step(t, x):
        op, f = read_op(t)
        return jax.lax.switch(
            jnp.clip(op, -1, 4) + 1,
            [_identity, _brightness, _contrast, _saturation, _hue, _gamma],
            x, f)

    return jax.lax.fori_loop(0, n_steps, step, x)


def _aug_kernel(seed_ref, noise_gate_ref, noise_scale_ref, noise_pc_ref,
                op_ids_ref, factors_ref, x_ref, *rest, out_dtype,
                has_bits: bool):
    """One grid program = one staged slot (3, S, S)."""
    if has_bits:  # injected uniform bits (CPU tests — the Mosaic
        bits1_ref, bits2_ref, o_ref = rest  # interpreter stubs the PRNG)
    else:
        (o_ref,) = rest
    n = pl.program_id(0)
    # Mosaic has no direct uint8->f32 cast lowering; stage through int32
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)   # (3, S, S)

    # decorrelate per-slot streams (Knuth multiplicative hash of the slot)
    if not has_bits:
        pltpu.prng_seed(seed_ref[0] ^ (n * np.int32(-1640531527)))
    x = _noised(x, noise_gate_ref[n], noise_scale_ref[n], noise_pc_ref[n],
                bits=(bits1_ref[0], bits2_ref[0]) if has_bits else None)
    x = _walk_program(x, lambda t: (op_ids_ref[n, t], factors_ref[n, t]),
                      op_ids_ref.shape[1])
    o_ref[0] = x.astype(out_dtype)


def fused_slot_aug(slots_planar: jax.Array, seed: jax.Array,
                   noise_gate: jax.Array, noise_scale: jax.Array,
                   noise_per_channel: jax.Array, op_ids: jax.Array,
                   factors: jax.Array, dtype=jnp.float32,
                   interpret: bool = False,
                   debug_bits=None) -> jax.Array:
    """slot_noise + planned_color_jitter in one HBM pass.

    slots_planar (N, 3, S, S) uint8; seed scalar int32 (one per step —
    slot streams derive from (seed, slot index)); noise_gate /
    noise_per_channel (N,) bool; noise_scale (N,) f32 in [0, 255] units;
    op_ids (N, 5) int32 / factors (N, 5) f32 host-planned programs
    (augment.sample_photometric). Returns (N, 3, S, S) ``dtype`` [0, 255].

    ``debug_bits`` (2, N, 3, S//2, S) uint32: test seam replacing the
    on-core PRNG draws (the Mosaic interpreter stubs ``prng_random_bits``
    to zeros, so CPU tests inject uniform bits and check the Box-Muller /
    gating math exactly; the hardware stream's statistics are asserted by
    a TPU-gated test). Half-height: each bit pair yields two normals.
    """
    n, c, s_h, s_w = slots_planar.shape
    assert c == 3
    assert s_h % 2 == 0, "noise generation assumes an even stage height"
    if interpret:  # the HLO interpreter lacks the TPU PRNG primitives;
        interpret = pltpu.InterpretParams()  # Mosaic's implements them
    kernel = functools.partial(_aug_kernel, out_dtype=dtype,
                               has_bits=debug_bits is not None)
    block = pl.BlockSpec((1, 3, s_h, s_w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [block]
    inputs = [slots_planar]
    if debug_bits is not None:
        bits_block = pl.BlockSpec((1, 3, s_h // 2, s_w),
                                  lambda i, *_: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [bits_block, bits_block]
        inputs += [debug_bits[0], debug_bits[1]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, s_h, s_w), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3, s_h, s_w), dtype),
        # the hue branch keeps ~15 live (S, S) f32 temps: 17.1 MB of scoped
        # VMEM at S=352 (~24 MB at the 416 multiscale max) vs the 16 MB
        # default limit; v5e has 128 MB physical VMEM per core
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        noise_gate.astype(jnp.int32),
        noise_scale.astype(jnp.float32),
        noise_per_channel.astype(jnp.int32),
        op_ids.astype(jnp.int32),
        factors.astype(jnp.float32),
        *inputs,
    )


def _taps_2d(o, in_size: int, s0, s1, d0, d1):
    """``ops/device_augment._axis_taps`` on a 2-D iota ``o`` (Mosaic has
    no 1-D vectors): per output pixel the two straddling source indices
    and the lerp fraction, edge-clamped like cv2.INTER_LINEAR."""
    denom = jnp.maximum(d1 - d0, 1e-6)
    u = s0 + (o + 0.5 - d0) * (s1 - s0) / denom
    u = jnp.clip(u - 0.5, 0.0, in_size - 1.0)
    i0f = jnp.floor(u)
    frac = u - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    return i0, i1, frac


def _two_hot(idx_iota, i0, i1, frac):
    """(rows, cols) bf16 matrix with frac-weighted two-hot rows/cols:
    multiplying by it performs the two-tap gather + lerp on the MXU.
    Edge-clamped taps (i0 == i1) sum to weight 1 exactly like the gather
    form ``img[i0]*(1-f) + img[i1]*f``."""
    w = (jnp.where(idx_iota == i0, 1.0 - frac, 0.0)
         + jnp.where(idx_iota == i1, frac, 0.0))
    return w.astype(jnp.bfloat16)


def _aug_compose_kernel(seed_ref, gate_ref, scale_ref, pc_ref, ops_ref,
                        facs_ref, src_ref, dst_ref, fillr_ref, fillc_ref,
                        ffm_ref, flip_ref, active_ref, x_ref, o_ref, *,
                        out_dtype, out_h: int, out_w: int):
    """One grid program = one OUTPUT image: noise + photometric program +
    the full geometric compose (expand/crop/flip/mosaic paste) of its <=4
    staged tiles, entirely in VMEM.

    The separable two-tap bilinear resample becomes two MXU matmuls per
    channel against frac-weighted two-hot matrices built on the fly from
    the host-planned rects — zero HBM traffic for the ~2 GFLOP/image of
    'dense' resample work that made the XLA weight-matrix formulation a
    54 ms non-starter in round 2 (PERF.md). Inactive tiles are skipped by
    a real scalar branch (mixed single/mosaic batches average ~2.5 of 4
    active slots — work XLA's data-independent schedule must always do).
    """
    b = pl.program_id(0)
    n_tiles = x_ref.shape[1]
    s_h, s_w = x_ref.shape[3], x_ref.shape[4]
    f32 = jnp.float32
    i32 = jnp.int32
    # output-grid and source-grid iotas, shared across tiles (Mosaic iota
    # must be integer; cast to f32 after)
    oy = jax.lax.broadcasted_iota(i32, (out_h, 1), 0).astype(f32)
    ox = jax.lax.broadcasted_iota(i32, (1, out_w), 1).astype(f32)
    yy = (oy + 0.5) / out_h            # normalized pixel centers
    xx = (ox + 0.5) / out_w
    sy_i = jax.lax.broadcasted_iota(i32, (out_h, s_h), 1)
    sx_i = jax.lax.broadcasted_iota(i32, (s_w, out_w), 0)
    syy = (jax.lax.broadcasted_iota(i32, (s_h, 1), 0).astype(f32)
           + 0.5) / s_h
    sxx = (jax.lax.broadcasted_iota(i32, (1, s_w), 1).astype(f32)
           + 0.5) / s_w

    out = jnp.zeros((3, out_h, out_w), f32)
    for k in range(n_tiles):
        def tile(out, k=k):
            # ---- per-slot pixel aug (same math as _aug_kernel) ----------
            pltpu.prng_seed(seed_ref[0]
                            ^ ((b * n_tiles + k) * np.int32(-1640531527)))
            x = x_ref[0, k].astype(jnp.int32).astype(f32)    # (3, S, S)
            x = _noised(x, gate_ref[b, k], scale_ref[b, k], pc_ref[b, k])
            x = _walk_program(
                x, lambda t: (ops_ref[b, k, t], facs_ref[b, k, t]),
                ops_ref.shape[2])

            flip = flip_ref[b, k] != 0
            sr0, sr1, sr2, sr3 = (src_ref[b, k, 0], src_ref[b, k, 1],
                                  src_ref[b, k, 2], src_ref[b, k, 3])
            dr0, dr1, dr2, dr3 = (dst_ref[b, k, 0], dst_ref[b, k, 1],
                                  dst_ref[b, k, 2], dst_ref[b, k, 3])

            # ---- per-tile mean fill (window mean of the jittered slot;
            # rects arrive pre-mirrored for flipped tiles, so the window
            # over the UNFLIPPED slot uses the mirrored rect) -------------
            m0 = jnp.where(flip, 1.0 - sr2, sr0)
            m2 = jnp.where(flip, 1.0 - sr0, sr2)
            smask = ((syy >= sr1) & (syy < sr3)
                     & (sxx >= m0) & (sxx < m2)).astype(f32)  # (S, S)
            cnt = jnp.maximum(jnp.sum(smask), 1.0)
            fmask = ((yy >= fillr_ref[b, k, 1]) & (yy < fillr_ref[b, k, 3])
                     & (xx >= fillr_ref[b, k, 0])
                     & (xx < fillr_ref[b, k, 2]))             # (H, W)
            pmask = ((yy >= dr1) & (yy < dr3)
                     & (xx >= dr0) & (xx < dr2))              # (H, W)

            # ---- two-hot resample matrices (flip folded into x taps) ----
            iy0, iy1, fy = _taps_2d(oy, s_h, sr1 * s_h, sr3 * s_h,
                                    dr1 * out_h, dr3 * out_h)   # (H, 1)
            w_y = _two_hot(sy_i, iy0, iy1, fy)                  # (H, S)
            ix0, ix1, fx = _taps_2d(ox, s_w, sr0 * s_w, sr2 * s_w,
                                    dr0 * out_w, dr2 * out_w)   # (1, W)
            ix0 = jnp.where(flip, s_w - 1 - ix0, ix0)
            ix1 = jnp.where(flip, s_w - 1 - ix1, ix1)
            w_x = _two_hot(sx_i, ix0, ix1, fx)                  # (S, W)

            planes = []
            for c in range(3):
                src_mean = jnp.sum(x[c] * smask) / cnt
                fcol = jnp.where(ffm_ref[b, k] != 0, src_mean,
                                 fillc_ref[b, k, c])
                rows = jnp.dot(w_y, x[c].astype(jnp.bfloat16),
                               preferred_element_type=f32)      # (H, S)
                res = jnp.dot(rows.astype(jnp.bfloat16), w_x,
                              preferred_element_type=f32)       # (H, W)
                plane = jnp.where(fmask, fcol, out[c])
                planes.append(jnp.where(pmask, res, plane))
            return jnp.stack(planes)

        out = jax.lax.cond(active_ref[b, k] != 0, tile,
                           lambda out: out, out)
    o_ref[0] = out.astype(out_dtype)


def fused_aug_compose_kernel(slots_planar: jax.Array, seed: jax.Array,
                             noise_gate: jax.Array, noise_scale: jax.Array,
                             noise_per_channel: jax.Array,
                             op_ids: jax.Array, factors: jax.Array,
                             src_rect: jax.Array, dst_rect: jax.Array,
                             fill_rect: jax.Array, fill_color: jax.Array,
                             fill_from_mean: jax.Array, flip: jax.Array,
                             active: jax.Array, out_hw,
                             dtype=jnp.bfloat16,
                             interpret: bool = False) -> jax.Array:
    """Noise + photometric program + geometric compose in ONE kernel.

    slots_planar (B, T, 3, S, S) uint8; per-slot plans (B, T, ...) as in
    ops/device_augment.geometric_compose; seed scalar int32. Returns the
    composed images (B, 3, H, W) ``dtype`` in [0, 255] (planar — the
    caller transposes to NHWC; H, W = ``out_hw``).
    """
    b, t, c, s_h, s_w = slots_planar.shape
    assert c == 3 and s_h % 2 == 0
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if interpret:
        interpret = pltpu.InterpretParams()
    kernel = functools.partial(_aug_compose_kernel, out_dtype=dtype,
                               out_h=out_h, out_w=out_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t, 3, s_h, s_w),
                               lambda i, *_: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, out_h, out_w),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, out_h, out_w), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        noise_gate.astype(jnp.int32),
        noise_scale.astype(jnp.float32),
        noise_per_channel.astype(jnp.int32),
        op_ids.astype(jnp.int32),
        factors.astype(jnp.float32),
        src_rect.astype(jnp.float32),
        dst_rect.astype(jnp.float32),
        fill_rect.astype(jnp.float32),
        fill_color.astype(jnp.float32),
        fill_from_mean.astype(jnp.int32),
        flip.astype(jnp.int32),
        active.astype(jnp.int32),
        slots_planar,
    )
