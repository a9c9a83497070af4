#!/usr/bin/env bash
# One-command reproduction of the reference's published result: 72.1 mAP
# on VOC2007-test (train on 07+12 trainval, ImageNet-pretrained MobileNetV2
# backbone, 352x352 — reference README.md:7-11).
#
# Chains download -> dataset build -> (optional backbone warm-start) ->
# 300-epoch training with the exact reference recipe -> final evaluation.
# This is the first command a user WITH network egress runs; the
# environment this framework was built in has none, so the in-env parity
# evidence is instead: bit-level loss/gradient/mAP parity vs the executed
# reference (tests/test_assign.py, PARITY.md), full-production-path
# convergence on fabricated VOC (docs/TRAINING.md §3b) and bidirectional
# checkpoint interop (tools/convert_torch.py).
#
# Usage:
#   bash scripts/reproduce_72p1.sh [--backbone-pth mobilenetv2.pth] [extra train flags...]
#
# The ImageNet MobileNetV2 checkpoint the reference warm-starts from is
# torch hub's mobilenet_v2-b0353104.pth (mobilenetv2.py:160-185):
#   curl -LO https://download.pytorch.org/models/mobilenet_v2-b0353104.pth
# Training from scratch also converges but lands below the published
# number — pass --backbone-pth to match the reference recipe exactly.
set -euo pipefail
cd "$(dirname "$0")/.."

BACKBONE_PTH=""
EXTRA=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --backbone-pth) BACKBONE_PTH="$2"; shift 2 ;;
    *) EXTRA+=("$1"); shift ;;
  esac
done

YAML=mobilenet_yolo_tpu/configs/voc_data.yaml
CKPT=checkpoint_voc72

echo "== 1/4 download VOC2007 + VOC2012 =="
[[ -d data/VOCdevkit/VOC2007 ]] || bash scripts/VOC2007.sh
[[ -d data/VOCdevkit/VOC2012 ]] || bash scripts/VOC2012.sh

echo "== 2/4 build record shards =="
[[ -d train-records && -d test-records ]] || \
  python -m mobilenet_yolo_tpu.cli.build_dataset -d "$YAML"

INIT=()
if [[ -n "$BACKBONE_PTH" ]]; then
  echo "== 3/4 convert ImageNet backbone =="
  [[ -f backbone_imagenet.npz ]] || python tools/convert_torch.py \
    --torch "$BACKBONE_PTH" --out backbone_imagenet.npz --what backbone
  INIT=(--init-from backbone_imagenet.npz)
else
  echo "== 3/4 no --backbone-pth given: training from scratch =="
fi

echo "== 4/4 train (reference recipe: AdamW 7e-4/4e-4, 300 epochs,"
echo "         LR x0.5 @ {100,170,240}, batch 32, multiscale 288-416) =="
# Orbax auto-resumes from $CKPT on restart, so re-running this script
# continues an interrupted training run.
python -m mobilenet_yolo_tpu.cli.train -y "$YAML" -c "$CKPT" \
  "${INIT[@]}" ${EXTRA+"${EXTRA[@]}"}

echo "== final evaluation (VOC2007-test, target 72.1 mAP) =="
python -m mobilenet_yolo_tpu.cli.eval -y "$YAML" -c "$CKPT"
