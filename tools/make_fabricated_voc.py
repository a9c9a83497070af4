"""Fabricate a learnable VOC-style detection dataset for end-to-end drives.

The environment has no network access, so VOC itself cannot be downloaded;
this generates a dataset large enough (default 400 train / 100 test, 5
classes) to exercise the FULL production path — VOC XML parsing, record
shard build, photometric/expand/crop/flip augmentation, mosaic groups,
multiscale collate, training, the val_conf controller and 11-point mAP —
and simple enough that MobileNetV2-YOLO converges from scratch in tens of
epochs. Each class is a distinct shape+color; backgrounds are textured
noise so batch statistics are healthy (all-zeros inputs NaN the BN chain).

A small fraction of boxes are marked ``difficult`` so the VOC difficult
protocol (ignored in AP) runs against real shards; the emitted data yaml
keeps them flagged in the test split only (``keep_difficult:
{trainval: false, test: true}`` — train like the reference build, eval
per the VOC protocol).

Usage:
    python tools/make_fabricated_voc.py --root /tmp/fabvoc \
        --train 400 --test 100 [--img-size 352]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


CLASSES = ["disk", "box", "tri", "ring", "cross"]
BASE_COLORS = {
    "disk": (220, 60, 60),
    "box": (60, 200, 60),
    "tri": (60, 90, 230),
    "ring": (230, 210, 60),
    "cross": (200, 70, 210),
}


def draw_object(img, cls: str, cx: int, cy: int, half: int, rng) -> None:
    import cv2
    color = tuple(int(np.clip(c + rng.integers(-35, 36), 0, 255))
                  for c in BASE_COLORS[cls])
    if cls == "disk":
        cv2.circle(img, (cx, cy), half, color, -1)
    elif cls == "box":
        cv2.rectangle(img, (cx - half, cy - half), (cx + half, cy + half),
                      color, -1)
    elif cls == "tri":
        pts = np.asarray([[cx, cy - half], [cx - half, cy + half],
                          [cx + half, cy + half]], np.int32)
        cv2.fillPoly(img, [pts], color)
    elif cls == "ring":
        cv2.circle(img, (cx, cy), half, color, max(2, half // 3))
    elif cls == "cross":
        arm = max(2, half // 3)
        cv2.rectangle(img, (cx - half, cy - arm), (cx + half, cy + arm),
                      color, -1)
        cv2.rectangle(img, (cx - arm, cy - half), (cx + arm, cy + half),
                      color, -1)


def make_image(rng, min_size=240, max_size=480, difficult_frac=0.08):
    import cv2
    h = int(rng.integers(min_size, max_size + 1))
    w = int(rng.integers(min_size, max_size + 1))
    # textured background: smooth gradient + noise
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (40 + 100 * (xx / w) * rng.random()
            + 100 * (yy / h) * rng.random())
    img = np.stack([base + rng.normal(0, 18, (h, w)) for _ in range(3)], -1)
    img = np.clip(img, 0, 255).astype(np.uint8)

    n_obj = int(rng.integers(1, 7))
    objects = []
    occupied = []
    for _ in range(n_obj):
        half = int(rng.uniform(0.05, 0.22) * min(h, w))
        for _trial in range(20):
            cx = int(rng.integers(half + 2, w - half - 2))
            cy = int(rng.integers(half + 2, h - half - 2))
            box = (cx - half, cy - half, cx + half, cy + half)
            # keep centers apart so boxes stay unambiguous
            if all(abs(cx - ox) > (half + oh) * 0.6
                   or abs(cy - oy) > (half + oh) * 0.6
                   for ox, oy, oh in occupied):
                break
        else:
            continue
        cls = CLASSES[int(rng.integers(0, len(CLASSES)))]
        draw_object(img, cls, cx, cy, half, rng)
        difficult = int(rng.random() < difficult_frac)
        occupied.append((cx, cy, half))
        objects.append((cls, box, difficult))
    return img, objects


def write_split(root, names, rng, log=print, **kw):
    import cv2
    for i, name in enumerate(names):
        img, objects = make_image(rng, **kw)
        h, w = img.shape[:2]
        cv2.imwrite(f"{root}/JPEGImages/{name}.jpg",
                    img[..., ::-1])  # RGB -> BGR for cv2
        objs = "\n".join(
            f"<object><name>{cls}</name><difficult>{diff}</difficult>"
            f"<bndbox><xmin>{b[0]+1}</xmin><ymin>{b[1]+1}</ymin>"
            f"<xmax>{b[2]+1}</xmax><ymax>{b[3]+1}</ymax></bndbox></object>"
            for cls, b, diff in objects)
        xml = (f"<annotation><size><width>{w}</width>"
               f"<height>{h}</height></size>{objs}</annotation>")
        with open(f"{root}/Annotations/{name}.xml", "w") as f:
            f.write(xml)
        if i and i % 100 == 0:
            log(f"  [{i}/{len(names)}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fabvoc")
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--test", type=int, default=100)
    ap.add_argument("--img-size", type=int, default=352)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import yaml
    root = args.root
    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
    rng = np.random.default_rng(args.seed)

    train_names = [f"tr{i:04d}" for i in range(args.train)]
    test_names = [f"te{i:04d}" for i in range(args.test)]
    print(f"writing {args.train} train images...")
    write_split(root, train_names, rng)
    print(f"writing {args.test} test images...")
    write_split(root, test_names, rng)
    with open(f"{root}/ImageSets/Main/trainval.txt", "w") as f:
        f.write("\n".join(train_names))
    with open(f"{root}/ImageSets/Main/test.txt", "w") as f:
        f.write("\n".join(test_names))

    s = args.img_size
    # object halves are U(0.05, 0.22)*min(H,W); at the 352 train scale boxes
    # span ~35..155 px — anchors bracket that range (large head first,
    # reference mask convention [[0,1,2],[3,4,5]])
    model_cfg = {
        "img_h": s, "img_w": s, "batch_size": args.batch_size,
        "train_img_size": [[288, 288], [320, 320], [352, 352],
                           [384, 384], [416, 416]],
        "expand_scale": 1.5, "mosaic_num": [1, 4],
        "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "nms_top_k": 512,
        "yolo": {
            "num_classes": len(CLASSES), "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[110, 110], [150, 150], [205, 205],
                        [40, 40], [62, 62], [85, 85]],
            "classes": len(CLASSES), "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    with open(f"{root}/model_config.yaml", "w") as f:
        yaml.safe_dump(model_cfg, f)
    data_cfg = {
        "trainval_dataset_path": {
            "imgs": [f"{root}/JPEGImages"], "annos": [f"{root}/Annotations"],
            "lists": [f"{root}/ImageSets/Main/trainval.txt"],
            "lmdb": f"{root}/train-records", "name": "fab_trainval"},
        "test_dataset_path": {
            "imgs": [f"{root}/JPEGImages"], "annos": [f"{root}/Annotations"],
            "lists": [f"{root}/ImageSets/Main/test.txt"],
            "lmdb": f"{root}/test-records", "name": "fab_test"},
        "segmentation_enable": False,
        # VOC protocol: train without difficult boxes (reference build
        # behavior), evaluate with them flagged (they match neither TP
        # nor FN)
        "keep_difficult": {"trainval": False, "test": True},
        "classes": {"original": CLASSES, "map": CLASSES},
        "extention_names": {"image": ["jpg"], "annotation": ["xml"]},
        "model_config_path": f"{root}/model_config.yaml",
    }
    with open(f"{root}/data.yaml", "w") as f:
        yaml.safe_dump(data_cfg, f)
    print(f"fabricated VOC ready at {root}")


if __name__ == "__main__":
    main()
