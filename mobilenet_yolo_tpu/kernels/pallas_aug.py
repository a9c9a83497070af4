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

    # ---- additive gaussian noise (imgaug AdditiveGaussianNoise) ----------
    # decorrelate per-slot streams (Knuth multiplicative hash of the slot)
    if not has_bits:
        pltpu.prng_seed(seed_ref[0] ^ (n * np.int32(-1640531527)))

    def noised(x):
        # half-size draws: each Box-Muller pair yields TWO independent
        # normals (r*cos, r*sin) — halves the PRNG words and the log/sqrt
        # transcendentals, which dominate the kernel's VPU time
        c, s_h, s_w = x_ref.shape[1:]         # (3, S, S), S even
        half = (c, s_h // 2, s_w)
        if has_bits:
            b1, b2 = bits1_ref[0], bits2_ref[0]
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
        z = jnp.where(noise_pc_ref[n] != 0, z, z[0:1])
        return jnp.clip(x + z * noise_scale_ref[n], 0.0, 255.0)

    x = jax.lax.cond(noise_gate_ref[n] != 0, noised, lambda x: x, x)

    # ---- host-planned photometric program (5 steps, shuffled order) ------
    def brightness(x, f):
        return jnp.clip(x * f, 0.0, 255.0)

    def contrast(x, f):
        m = jnp.mean(_luma(x[0], x[1], x[2]))
        return jnp.clip(m + f * (x - m), 0.0, 255.0)

    def saturation(x, f):
        gray = _luma(x[0], x[1], x[2])[None]
        return jnp.clip(gray + f * (x - gray), 0.0, 255.0)

    def hue(x, f):
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

    def gamma(x, f):
        return jnp.clip((x / 255.0) ** f * 255.0, 0.0, 255.0)

    def identity(x, f):
        return x

    def step(t, x):
        op = op_ids_ref[n, t]
        f = factors_ref[n, t]
        return jax.lax.switch(
            jnp.clip(op, -1, 4) + 1,
            [identity, brightness, contrast, saturation, hue, gamma], x, f)

    x = jax.lax.fori_loop(0, op_ids_ref.shape[1], step, x)
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
