#!/usr/bin/env bash
# Download + unpack Pascal VOC2007 (trainval + test), like the reference
# scripts/VOC2007.sh. Run from the repo root; data lands in data/VOCdevkit.
set -euo pipefail
mkdir -p data && cd data
start=$(date +%s)
echo "Downloading VOC2007 trainval ..."
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar
echo "Downloading VOC2007 test data ..."
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar
echo "Done downloading. ($(($(date +%s) - start))s)"
echo "Extracting trainval ..."
tar -xf VOCtrainval_06-Nov-2007.tar
echo "Extracting test ..."
tar -xf VOCtest_06-Nov-2007.tar
echo "removing tars ..."
rm VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar
echo "VOC2007 ready under data/VOCdevkit"
