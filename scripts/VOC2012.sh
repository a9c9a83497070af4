#!/usr/bin/env bash
# Download + unpack Pascal VOC2012 trainval (reference scripts/VOC2012.sh).
set -euo pipefail
mkdir -p data && cd data
start=$(date +%s)
echo "Downloading VOC2012 trainval ..."
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar
echo "Done downloading. ($(($(date +%s) - start))s)"
echo "Extracting trainval ..."
tar -xf VOCtrainval_11-May-2012.tar
rm VOCtrainval_11-May-2012.tar
echo "VOC2012 ready under data/VOCdevkit"
