"""Minimal TPU compile probe for kernels/pallas_aug.py (small shapes).

Run FIRST after any kernel change, bounded by `timeout` — a failed remote
Pallas compile can wedge the relay (CLAUDE.md), so probe small before
benching full shapes:

    PYTHONPATH=/root/repo:$PYTHONPATH timeout 300 \
        python tools/probe_pallas_aug.py [--size 64] [--slots 4]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    print("backend:", jax.default_backend(), flush=True)
    print("health:", float(jnp.ones((8, 8)).sum()), flush=True)

    from mobilenet_yolo_tpu.data import augment as host_aug
    from mobilenet_yolo_tpu.kernels.pallas_aug import fused_slot_aug

    rng = np.random.default_rng(0)
    n, s = args.slots, args.size
    slots = rng.integers(0, 255, (n, 3, s, s)).astype(np.uint8)
    plans = [host_aug.sample_photometric(rng) for _ in range(n)]
    ops = np.stack([p[0] for p in plans]).astype(np.int32)
    facs = np.stack([p[1] for p in plans]).astype(np.float32)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    out = fused_slot_aug(
        jnp.asarray(slots), jnp.int32(7),
        jnp.asarray(rng.random(n) < 0.5), jnp.full((n,), 8.0, jnp.float32),
        jnp.asarray(rng.random(n) < 0.3), jnp.asarray(ops),
        jnp.asarray(facs), dtype=dtype)
    out = np.asarray(out)
    print("compiled+ran:", out.shape, out.dtype,
          "range", float(out.min()), float(out.max()), flush=True)

    # parity vs the XLA ops (noise off for determinism)
    from mobilenet_yolo_tpu.ops import device_augment as dev
    got = np.asarray(fused_slot_aug(
        jnp.asarray(slots), jnp.int32(7), jnp.zeros(n, bool),
        jnp.zeros(n, np.float32), jnp.zeros(n, bool), jnp.asarray(ops),
        jnp.asarray(facs), dtype=jnp.float32))
    want = np.asarray(dev.planned_color_jitter(
        jnp.asarray(slots.transpose(0, 2, 3, 1)), jnp.asarray(ops),
        jnp.asarray(facs)))
    err = np.abs(got.transpose(0, 2, 3, 1) - want).max()
    print("max |kernel - xla| =", float(err), flush=True)
    assert err < 2e-2, err

    # full aug+compose kernel vs the XLA stages (noise off, mixed tiles)
    from mobilenet_yolo_tpu.ops.device_augment import (fused_aug_compose,
                                                       geometric_compose)
    b = max(2, n // 4)
    slots_b = rng.integers(0, 255, (b, 4, s, s, 3)).astype(np.uint8)
    src = np.tile(np.float32([0.1, 0.05, 0.9, 0.85]), (b, 4, 1))
    dstq = np.tile(np.float32([[0, 0, .5, .5], [.5, 0, 1, .5],
                               [0, .5, .5, 1], [.5, .5, 1, 1]]), (b, 1, 1))
    plans = [host_aug.sample_photometric(rng) for _ in range(b * 4)]
    opsb = np.stack([p[0] for p in plans]).reshape(b, 4, 5).astype(np.int32)
    facb = np.stack([p[1] for p in plans]).reshape(b, 4, 5).astype(
        np.float32)
    args2 = dict(
        fill_rect=jnp.asarray(dstq), fill_color=jnp.full((b, 4, 3), 99.0),
        fill_from_mean=jnp.asarray(rng.random((b, 4)) < 0.5),
        flip=jnp.asarray(rng.random((b, 4)) < 0.5),
        active=jnp.asarray(np.concatenate(
            [np.ones((b, 1), bool),
             rng.random((b, 3)) < 0.7], axis=1)))
    out_full = np.asarray(fused_aug_compose(
        jnp.asarray(slots_b), jnp.asarray(src), jnp.asarray(dstq),
        args2["fill_rect"], args2["fill_color"], args2["fill_from_mean"],
        args2["flip"], args2["active"], (s, s),
        jnp.zeros((b, 4), bool), jnp.zeros((b, 4), np.float32),
        jnp.zeros((b, 4), bool), jnp.asarray(opsb), jnp.asarray(facb),
        jax.random.PRNGKey(1), dtype=jnp.bfloat16, full=True),
        np.float32)
    ref_full = np.asarray(geometric_compose(
        jnp.asarray(slots_b), jnp.asarray(src), jnp.asarray(dstq),
        args2["fill_rect"], args2["fill_color"], args2["fill_from_mean"],
        args2["flip"], args2["active"], (s, s),
        jitter_op=jnp.asarray(opsb), jitter_factor=jnp.asarray(facb)))
    d = np.abs(out_full - ref_full)
    print("full kernel vs xla: max", float(d.max()),
          "mean", float(d.mean()), flush=True)
    assert d.max() < 5.0 and d.mean() < 1.0, (d.max(), d.mean())
    print("OK", flush=True)


if __name__ == "__main__":
    main()
