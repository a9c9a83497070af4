"""Staged Pallas feasibility probe for a speed-of-light stem conv.

The 3x3/s2 RGB stem is ~1.9-2.2 ms at batch 128/352² in every XLA
formulation (tools/probe_stem.py) vs a ~0.5 ms HBM roofline. Previous
fused kernels lost to Mosaic relayout/roll staging (PERF.md "What was
tried"), so this probes the cost structure incrementally, one stage per
run, small-shape first (CLAUDE.md: a failed remote Pallas compile can
wedge the relay):

  stage a: pure streaming — load the (S, S*3) f32 image, write a
           constant (S/2, S/2*32) bf16 tile. The roofline. If THIS is
           over ~0.8 ms, no stem kernel can win; stop.
  stage b: + the layout work — strided row-phase slices and lane rolls
           that the real stem needs, reduced into the output.
  stage c: the full stem math — 9 shifted K=3 matmuls + bias + ReLU6,
           exact vs lax.conv (checked compiled, small shape).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 580 \
        python tools/probe_stem_pallas.py --stage a [--size 64] [--bench]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def _kernel_a(x_ref, o_ref):
    import jax.numpy as jnp
    x = x_ref[0]                       # (S, S*3) f32
    s = x.shape[0]
    h = s // 2
    # read every input element (row-reduce), write every output element
    rowsum = jnp.sum(x, axis=1, keepdims=True)       # (S, 1)
    o_ref[0] = jnp.broadcast_to(rowsum[:h] + rowsum[h:],
                                (h, h * 32)).astype(o_ref.dtype)


def _kernel_b(x_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp
    x = x_ref[0]                       # (S, S*3) f32
    s = x.shape[0]
    h = s // 2
    # row phases via strided reshape-slices (the stem's 3-tap row access)
    xr = x.reshape(h, 2, s * 3)
    p0 = xr[:, 0]
    p1 = xr[:, 1]
    p1m = pltpu.roll(p1, 1, 0)         # cell i-1's odd row
    # column taps via lane rolls by one/two pixels (3/6 f32 lanes)
    acc = p0 + p1 + p1m
    acc = acc + pltpu.roll(acc, 3, 1) + pltpu.roll(acc, s * 3 - 3, 1)
    o_ref[0] = jnp.broadcast_to(jnp.sum(acc, 1, keepdims=True),
                                (h, h * 32)).astype(o_ref.dtype)


def _kernel_c(x_ref, w_ref, b_ref, o_ref):
    import jax
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp
    x = x_ref[0]                       # (S, S*3) f32
    s = x.shape[0]
    h = s // 2
    xr = x.reshape(h, 2, s * 3)
    p0, p1 = xr[:, 0], xr[:, 1]
    # conv pad=1: rolled-in wraparound values must be ZERO, like the
    # padding the conv sees (row -1 at i=0; pixel -1 at j=0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (h, s * 3), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (h, s * 3), 1)
    p1m = jnp.where(row_i == 0, 0.0, pltpu.roll(p1, 1, 0))
    # row sources for output row i: orig rows 2i-1 (p1m), 2i (p0), 2i+1 (p1)
    acc = jnp.zeros((h * h, 32), jnp.float32)
    for ky, rows in ((0, p1m), (1, p0), (2, p1)):
        # column taps: orig cols 2j-1, 2j, 2j+1 -> lane-roll the row by
        # +3 (left neighbor pixel) / 0 / -3, then take the even-pixel
        # 3-lane groups via a (h, h, 6) phase reshape
        for kx, sh in ((0, 3), (1, 0), (2, s * 3 - 3)):
            if kx == 0:
                r = jnp.where(lane_i < 3, 0.0, pltpu.roll(rows, 3, 1))
            elif kx == 1:
                r = rows
            else:
                r = pltpu.roll(rows, sh, 1)
            cells = r.reshape(h, h, 6)[:, :, 0:3]      # (h, h, 3)
            acc = acc + jnp.dot(cells.reshape(h * h, 3),
                                w_ref[ky * 3 + kx].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
    acc = jnp.clip(acc + b_ref[:], 0.0, 6.0)
    o_ref[0] = acc.reshape(h, h * 32).astype(o_ref.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["a", "b", "c"], default="a")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bench", action="store_true",
                    help="time at batch 128 / 352 after the small check")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    print("backend:", jax.default_backend(), flush=True)

    def build(stage, b, s):
        h = s // 2
        in_specs = [pl.BlockSpec((1, s, s * 3), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
        kernel = {"a": _kernel_a, "b": _kernel_b, "c": _kernel_c}[stage]
        extra = ()
        if stage == "c":
            in_specs += [
                pl.BlockSpec((9, 3, 32), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ]
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, h, h * 32), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, h * 32), jnp.bfloat16),
            interpret=(pltpu.InterpretParams() if args.interpret else False),
        )

    rng = np.random.default_rng(0)
    b, s = args.batch, args.size
    x = rng.normal(0, 1, (b, s, s, 3)).astype(np.float32)
    xf = jnp.asarray(x.reshape(b, s, s * 3))
    if args.stage == "c":
        k = rng.normal(0, 0.2, (3, 3, 3, 32)).astype(np.float32)
        bias = rng.normal(0, 0.1, (32,)).astype(np.float32)
        w9 = jnp.asarray(k.reshape(9, 3, 32))
        out = build("c", b, s)(xf, w9, jnp.asarray(bias))
        # oracle: lax.conv 3x3/s2 pad1 + bias + relu6 on the SAME input,
        # subsampled to the kernel's (h, h) output grid (stride-2 output
        # pixel (i, j) of the kernel reads orig rows/cols 2i-1..2i+1)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = jnp.clip(ref + bias, 0.0, 6.0)
        got = np.asarray(out, np.float32).reshape(b, s // 2, s // 2, 32)
        err = np.abs(got - np.asarray(ref, np.float32)).max()
        print("stage c exactness vs lax.conv:", err, flush=True)
        assert err < 0.05, err
    else:
        out = build(args.stage, b, s)(xf)
        print("ran:", out.shape, out.dtype, flush=True)

    if args.bench:
        B, S = 128, 352
        xb = jnp.asarray(rng.normal(0, 1, (B, S, S * 3)).astype(np.float32))
        fargs = (xb,)
        if args.stage == "c":
            fargs = (xb, w9, jnp.asarray(bias))
        f = build(args.stage, B, S)

        @jax.jit
        def dep(x, out):
            return x * (1 + 0 * out.reshape(-1)[0].astype(x.dtype))

        def chain(n):
            xx = xb
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(*((xx,) + fargs[1:]))
                xx = dep(xb, o)
            _ = float(jnp.ravel(xx)[0])
            return (time.perf_counter() - t0) / n
        chain(3)
        dt = min(chain(16), chain(16))
        print(f"stage {args.stage} @ {B}x{S}: {dt * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
