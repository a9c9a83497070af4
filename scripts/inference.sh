#!/usr/bin/env bash
# Single-image demo (reference scripts/inference.sh, which demos BDD100K).
set -euo pipefail
python -m mobilenet_yolo_tpu.cli.infer \
    -y mobilenet_yolo_tpu/configs/bdd100k_data.yaml \
    -c checkpoint \
    -i "${1:-images/demo.jpg}"
