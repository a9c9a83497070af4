#!/usr/bin/env bash
# VOC training with the reference recipe (reference scripts/train.sh).
set -euo pipefail
python -m mobilenet_yolo_tpu.cli.train \
    -y mobilenet_yolo_tpu/configs/voc_data.yaml \
    -c checkpoint "$@"
