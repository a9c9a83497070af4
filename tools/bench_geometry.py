"""Benchmark the device-geometry train step against the plain step.

Reproduces the PERF.md "geometry step overhead" table: plain train step vs
geometry train step (slot noise + planned color jitter + geometric compose
+ forward/loss/backward/update) at batch 32, 352x352, worst case (all 4
tiles active on every image), device-resident inputs. ``--stages`` also
times the pre-forward aug stages in isolation (noise / +jitter / +compose)
so each optimization's contribution is attributable.

Methodology: chained timer (utils/profiling.py) — each iteration's input
carries a data dependency on the previous output; measure twice, trust the
second (PERF.md addendum).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_geometry.py \
          [--batch-size 32] [--img-size 352] [--dtype f32|bf16] [--stages]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _geometry_batch(rng, b: int, s: int):
    """Worst-case geometry arrays: every image a 4-tile mosaic."""
    from mobilenet_yolo_tpu.data import augment

    slots = rng.integers(0, 255, (b, 4, s, s, 3), np.uint8)
    # quadrant mosaic: tile k pastes into quadrant k from a random window
    src = np.zeros((b, 4, 4), np.float32)
    dst = np.zeros((b, 4, 4), np.float32)
    fill = np.zeros((b, 4, 4), np.float32)
    quads = [(0, 0), (0.5, 0), (0, 0.5), (0.5, 0.5)]
    for k, (qx, qy) in enumerate(quads):
        x1 = rng.uniform(0.0, 0.2, b)
        y1 = rng.uniform(0.0, 0.2, b)
        src[:, k] = np.stack([x1, y1, x1 + rng.uniform(0.6, 0.8, b),
                              y1 + rng.uniform(0.6, 0.8, b)], -1)
        dst[:, k] = [qx, qy, qx + 0.5, qy + 0.5]
        fill[:, k] = dst[:, k]
    ops = np.stack([np.stack(augment.sample_photometric(rng))
                    for _ in range(b * 4)])
    gt = np.zeros((b, 30, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    return {
        "slots": slots, "src_rect": src, "dst_rect": dst, "fill_rect": fill,
        "fill_color": np.full((b, 4, 3), 127.5, np.float32),
        "fill_from_mean": np.ones((b, 4), bool),
        "flip": rng.random((b, 4)) < 0.5,
        "active": np.ones((b, 4), bool),
        "noise_gate": rng.random((b, 4)) < 0.5,
        "noise_scale": rng.uniform(0, 0.03 * 255, (b, 4)).astype(np.float32),
        "noise_per_channel": rng.random((b, 4)) < 0.3,
        "jitter_op": ops[:, 0].astype(np.int32).reshape(b, 4, 5),
        "jitter_factor": ops[:, 1].astype(np.float32).reshape(b, 4, 5),
        "gt": gt, "n_gt": np.ones((b,), np.int32),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--img-size", type=int, default=352)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    parser.add_argument("--stages", action="store_true",
                        help="also time the aug stages in isolation")
    parser.add_argument("--fused", choices=["auto", "on", "split", "off"],
                        default="auto",
                        help="fused Pallas aug kernel in the geometry step "
                             "(on=full aug+compose kernel, split=per-slot "
                             "kernel + XLA compose)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from __graft_entry__ import _VOC_MODEL_CFG
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import (GEOMETRY_BATCH_KEYS,
                                               make_geometry_train_step,
                                               make_train_step)

    b, s = args.batch_size, args.img_size
    cfg = dict(_VOC_MODEL_CFG)
    cfg["normalize"] = {"mean": [0.5] * 3, "std": [1.0] * 3}
    model = build_model(cfg, "mbv2",
                        dtype=jnp.bfloat16 if args.dtype == "bf16" else None)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (s, s),
                                   batch_size=b)

    rng = np.random.default_rng(0)
    gb = {k: jnp.asarray(v) for k, v in _geometry_batch(rng, b, s).items()}
    geom = tuple(gb[k] for k in GEOMETRY_BATCH_KEYS)
    images = jnp.asarray(
        rng.integers(0, 255, (b, s, s, 3)).astype(np.float32) / 2.0)
    key = jax.random.PRNGKey(7)

    def timed(label, fn, *fn_args, state_arg=None):
        """Chained timing: perturb the first array arg via the output."""
        @jax.jit
        def add_dep(x, out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return x * (1 + 0 * jnp.ravel(leaf)[0].astype(x.dtype))

        def chain(n, x0):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(x, *fn_args, state_arg)
                x = add_dep(x0, out)
            _ = float(jnp.ravel(x)[0])
            return (time.perf_counter() - t0) / n

        x0 = jnp.asarray(gb["slots"], jnp.float32)  # perturbable copy
        chain(2, x0)
        dt = min(chain(args.iters, x0), chain(args.iters, x0))
        print(f"{label:42s} {dt * 1e3:8.2f} ms")
        return dt * 1e3

    from mobilenet_yolo_tpu.ops.device_augment import (geometric_compose,
                                                       planned_color_jitter,
                                                       slot_noise)
    aug_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    results = {}
    # plain step: images pre-composed, normalize on device like geometry.
    # Both steps DONATE their state arg, so each runner carries the updated
    # state in a cell (reusing the original donated buffers is an error).
    plain = make_train_step(model, cfg, tx, normalize=True)
    cell = [state]

    def run_plain(x, _):
        new_state, m = plain(cell[0], images * (1 + 0 * x[0, 0, 0, 0, 0]),
                             gb["gt"], gb["n_gt"])
        cell[0] = new_state
        return m["loss"]
    results["plain_step"] = timed("plain train step", run_plain,
                                  state_arg=None)

    fused = {"auto": None, "on": True, "split": "split",
             "off": False}[args.fused]
    gstep = make_geometry_train_step(model, cfg, tx, fused_aug=fused)

    def run_geom(x, _):
        g = (x.astype(jnp.uint8),) + geom[1:]
        new_state, m = gstep(cell[0], *g, gb["gt"], gb["n_gt"], key,
                             out_hw=(s, s))
        cell[0] = new_state
        return m["loss"]
    results["geometry_step"] = timed("geometry train step", run_geom,
                                     state_arg=None)
    results["overhead_ms"] = results["geometry_step"] - results["plain_step"]
    results["ratio"] = results["geometry_step"] / results["plain_step"]

    if args.stages:
        @jax.jit
        def stage_noise(x, _):
            return slot_noise(x.astype(jnp.uint8), key, gb["noise_gate"],
                              gb["noise_scale"], gb["noise_per_channel"],
                              dtype=aug_dtype).sum()

        @jax.jit
        def stage_jitter(x, _):
            sl = slot_noise(x.astype(jnp.uint8), key, gb["noise_gate"],
                            gb["noise_scale"], gb["noise_per_channel"],
                            dtype=aug_dtype)
            flat = sl.reshape((b * 4, s, s, 3))
            return planned_color_jitter(
                flat, gb["jitter_op"].reshape(b * 4, 5),
                gb["jitter_factor"].reshape(b * 4, 5), dtype=aug_dtype).sum()

        @jax.jit
        def stage_compose(x, _):
            sl = slot_noise(x.astype(jnp.uint8), key, gb["noise_gate"],
                            gb["noise_scale"], gb["noise_per_channel"],
                            dtype=aug_dtype)
            return geometric_compose(
                sl, gb["src_rect"], gb["dst_rect"], gb["fill_rect"],
                gb["fill_color"], gb["fill_from_mean"], gb["flip"],
                gb["active"], (s, s), jitter_op=gb["jitter_op"],
                jitter_factor=gb["jitter_factor"], dtype=aug_dtype).sum()

        n = timed("slot_noise", stage_noise, state_arg=None)
        j = timed("noise + planned jitter", stage_jitter, state_arg=None)
        c = timed("noise + jitter + compose", stage_compose, state_arg=None)
        results.update(stage_noise_ms=n, stage_jitter_ms=j - n,
                       stage_compose_ms=c - j, stage_total_ms=c)

        if fused is not False:
            from mobilenet_yolo_tpu.ops.device_augment import \
                fused_aug_compose

            @jax.jit
            def stage_fused(x, _):
                return fused_aug_compose(
                    x.astype(jnp.uint8), gb["src_rect"], gb["dst_rect"],
                    gb["fill_rect"], gb["fill_color"], gb["fill_from_mean"],
                    gb["flip"], gb["active"], (s, s), gb["noise_gate"],
                    gb["noise_scale"], gb["noise_per_channel"],
                    gb["jitter_op"], gb["jitter_factor"], key,
                    dtype=aug_dtype, full=fused in (True, None)).sum()
            results["stage_fused_total_ms"] = timed(
                "fused aug (+compose)", stage_fused, state_arg=None)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
