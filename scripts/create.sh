#!/usr/bin/env bash
# Build record shards from a data yaml (reference scripts/create.sh, which
# runs the LMDB builder). Pass a data yaml or default to VOC.
set -euo pipefail
YAML="${1:-mobilenet_yolo_tpu/configs/voc_data.yaml}"
python -m mobilenet_yolo_tpu.cli.build_dataset -d "$YAML"
