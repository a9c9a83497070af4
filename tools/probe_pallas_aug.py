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
    print("OK", flush=True)


if __name__ == "__main__":
    main()
