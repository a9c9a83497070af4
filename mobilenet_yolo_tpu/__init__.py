"""mobilenet_yolo_tpu — a TPU-native (JAX/XLA/Pallas) MobileNet-YOLO framework.

A from-scratch rebuild of the capabilities of eric612/Mobilenet-YOLO-Pytorch,
designed TPU-first:

* models/   — flax.linen NHWC backbones (MobileNetV2/V3) and detector graphs
* ops/      — pure-function numerics: IoU/CIoU, anchor grids, decode,
              fully-vectorized target assignment, batched fixed-K NMS, VOC mAP
* kernels/  — Pallas TPU kernels for the hot post-processing ops
* parallel/ — mesh construction + sharding specs (DP over ICI via jit/shard_map)
* data/     — record-shard dataset (C++ store + Python fallback), offline
              builder (VOC XML / COCO JSON), SSD-style augmentation, mosaic
* train/    — jitted train/eval steps, AdamW + step schedule, Orbax
              checkpointing, val_conf feedback controller, metrics/logging
* eval/     — batched decode→NMS→mAP driver
* cli/      — train / infer / build_dataset / eval entry points with the same
              two-level YAML config contract as the reference

The reference's layer map and component inventory live in /root/repo/SURVEY.md;
docstrings across this package cite reference files as ``file:line`` so parity
can be audited.
"""

__version__ = "0.1.0"
