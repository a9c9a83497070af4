"""Benchmark: batched 352x352 MobileNetV2-YOLO inference throughput.

Measures the full detection pipeline (forward + decode + class-aware NMS)
in images/sec on one chip and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}``.

Baseline: the BASELINE.json north-star target of 5000 images/sec/chip on
TPU v5e (the reference publishes no throughput number; its per-image
inference.py:120-124 timing on GPU is orders of magnitude below this).
``vs_baseline`` is value / 5000.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 5000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--img-size", type=int, default=352)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from __graft_entry__ import _VOC_MODEL_CFG

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = build_model(dict(_VOC_MODEL_CFG, dtype=None), "mbv2")
    # compute in bf16 on the MXU; params stay f32 (flax casts via model dtype)
    if args.dtype == "bf16":
        from mobilenet_yolo_tpu.models import MBv2YOLO
        model = MBv2YOLO(num_classes=20, num_anchors=3, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1, (args.batch_size, args.img_size, args.img_size, 3))
        .astype(np.float32))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    predict = make_predict_fn(model, _VOC_MODEL_CFG)
    val_conf = jnp.float32(0.3)

    # warmup / compile
    for _ in range(args.warmup):
        dets, keep = predict(variables, x, val_conf)[:2]
    jax.block_until_ready(dets)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        dets, keep = predict(variables, x, val_conf)[:2]
    jax.block_until_ready(dets)
    dt = time.perf_counter() - t0

    images_per_sec = args.batch_size * args.iters / dt
    print(json.dumps({
        "metric": f"mbv2-yolo {args.img_size}x{args.img_size} batched "
                  f"inference throughput ({args.dtype}, incl. decode+NMS)",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
