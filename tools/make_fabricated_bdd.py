"""Fabricate a BDD100K-style MULTI-TASK dataset (detection + drivable-area
segmentation) for end-to-end drives of the seg branch.

The BDD100K pipeline differs from VOC in three ways this exercises:
per-image COCO-style JSON annotations with a class remap
(data/dataset_builder.py:parse_coco_json, reference
od_dataset_from_file.py:202-229), single-channel class-id segmentation
PNGs rasterized to (H/16, W/16, C) training targets, and the seg head +
SegLoss joint objective (reference models/seg_loss.py).

Each image gets two drivable-area-style bands whose ids correlate with a
visible tint (id 1: warm tint, id 2: cool tint) so the seg branch has a
learnable signal; detection objects are the same five shapes as the
fabricated VOC (two are dropped by the class map to exercise the COCO
remap path).

Usage:
    python tools/make_fabricated_bdd.py --root /tmp/fabbdd \
        --train 200 --test 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_fabricated_voc import CLASSES  # noqa: E402

# the data yaml's original->map remap drops "ring" and "cross", exercising
# parse_coco_json's class filter (reference keeps 7 of 10 BDD classes)
KEPT = ["disk", "box", "tri"]


def make_seg_bands(img: np.ndarray, rng) -> np.ndarray:
    """Two wavy horizontal bands with ids 1/2 + a visible tint."""
    h, w = img.shape[:2]
    yy = np.arange(h, dtype=np.float32)[:, None]
    xx = np.arange(w, dtype=np.float32)[None, :]
    phase = rng.uniform(0, 2 * np.pi)
    amp = rng.uniform(0.03, 0.08) * h
    mid = rng.uniform(0.45, 0.65) * h + amp * np.sin(
        2 * np.pi * xx / w + phase)
    band = rng.uniform(0.10, 0.18) * h
    seg = np.zeros((h, w), np.uint8)
    m1 = (yy >= mid) & (yy < mid + band)
    m2 = (yy >= mid + band) & (yy < mid + 2 * band)
    seg[m1] = 1
    seg[m2] = 2
    f = img.astype(np.float32)
    f[m1] += np.asarray([35, 12, -18], np.float32)   # warm tint
    f[m2] += np.asarray([-18, 12, 35], np.float32)   # cool tint
    img[:] = np.clip(f, 0, 255).astype(np.uint8)
    return seg


def write_split(root: str, split: str, names, rng) -> None:
    import cv2
    from make_fabricated_voc import make_image

    for name in names:
        img, objects = make_image(rng, difficult_frac=0.0)
        seg = make_seg_bands(img, rng)
        h, w = img.shape[:2]
        cv2.imwrite(f"{root}/images/{split}/{name}.jpg", img[..., ::-1])
        cv2.imwrite(f"{root}/drivable_maps/{split}/{name}.png", seg)
        anns = [{"category_id": CLASSES.index(cls) + 1,
                 "bbox": [float(b[0]), float(b[1]),
                          float(b[2] - b[0]), float(b[3] - b[1])]}
                for cls, b, _diff in objects]
        with open(f"{root}/annotations/{split}/{name}.json", "w") as f:
            json.dump({"image": {"width": w, "height": h},
                       "annotation": anns}, f)
    with open(f"{root}/ImageSets/{split}.txt", "w") as f:
        f.write("\n".join(names) + "\n")


DATA_YAML = """# fabricated BDD-style multi-task data config
trainval_dataset_path:
  imgs: [{root}/images/train]
  annos: [{root}/annotations/train]
  segs: [{root}/drivable_maps/train]
  lists: [{root}/ImageSets/train.txt]
  lmdb: {root}/train-records
  name: fabbdd_train
test_dataset_path:
  imgs: [{root}/images/test]
  annos: [{root}/annotations/test]
  segs: [{root}/drivable_maps/test]
  lists: [{root}/ImageSets/test.txt]
  lmdb: {root}/test-records
  name: fabbdd_test
segmentation_enable: true
segmentation_num_classes: 2
classes:
  original: [{orig}]
  map: [{kept}]
extention_names:
  image: [jpg]
  annotation: [json]
  segmentation: [png]
model_config_path: "config.yaml"
"""

MODEL_YAML = """# fabricated-BDD model config (multi-task, single-scale)
img_h: 352
img_w: 352
batch_size: 32
train_img_size:
  - [352, 352]
expand_scale: 1.3
mosaic_num: [1]
iou_weighting: 0.02
nms_top_k: 512
normalize:
  mean: [0.5, 0.5, 0.5]
  std: [1, 1, 1]
yolo:
  num_classes: 3
  num_anchors: 3
  ignore_thresh: [0.6, 0.55]
  iou_thresh: 0.6
  anchors:
  - [120, 120]
  - [170, 170]
  - [240, 240]
  - [30, 30]
  - [55, 55]
  - [85, 85]
  classes: 3
  mask:
  - [0, 1, 2]
  - [3, 4, 5]
seg:
  num_classes: 2
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fabbdd")
    ap.add_argument("--train", type=int, default=200)
    ap.add_argument("--test", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for split in ("train", "test"):
        for d in ("images", "annotations", "drivable_maps"):
            os.makedirs(f"{args.root}/{d}/{split}", exist_ok=True)
    os.makedirs(f"{args.root}/ImageSets", exist_ok=True)

    print(f"writing {args.train} train images...")
    write_split(args.root, "train",
                [f"tr{i:05d}" for i in range(args.train)], rng)
    print(f"writing {args.test} test images...")
    write_split(args.root, "test",
                [f"te{i:05d}" for i in range(args.test)], rng)

    with open(f"{args.root}/data.yaml", "w") as f:
        f.write(DATA_YAML.format(root=args.root,
                                 orig=", ".join(CLASSES),
                                 kept=", ".join(KEPT)))
    with open(f"{args.root}/config.yaml", "w") as f:
        f.write(MODEL_YAML)
    print(f"fabricated BDD-style dataset ready at {args.root}")


if __name__ == "__main__":
    main()
