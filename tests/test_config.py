import os

import pytest

from mobilenet_yolo_tpu.config import apply_overrides, load_config, validate_model_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "mobilenet_yolo_tpu", "configs")


def test_load_voc_config():
    cfg = load_config(os.path.join(CFG_DIR, "voc_data.yaml"))
    assert cfg.num_classes == 20
    assert cfg.img_size == (352, 352)
    assert cfg.classes[0] == "background"
    assert len(cfg.classes) == 21
    assert cfg.masks == [[0, 1, 2], [3, 4, 5]]
    assert not cfg.segmentation_enabled
    assert len(cfg.model["train_img_size"]) == 5


def test_load_bdd_config():
    cfg = load_config(os.path.join(CFG_DIR, "bdd100k_data.yaml"))
    assert cfg.num_classes == 7
    assert cfg.segmentation_enabled
    assert cfg.seg_num_classes == 2


def test_overrides():
    cfg = load_config(os.path.join(CFG_DIR, "voc_data.yaml"),
                      overrides={"iou_thresh": 0.4, "ignore_thresh_1": 0.7,
                                 "mosaic_num": [2, 3], "unknown_key": 1,
                                 "expand_scale": None})
    assert cfg.model["yolo"]["iou_thresh"] == 0.4
    assert cfg.model["yolo"]["ignore_thresh"][0] == 0.7
    assert cfg.model["yolo"]["ignore_thresh"][1] != 0.7
    assert cfg.model["mosaic_num"] == [2, 3]
    # expand_scale None => untouched
    assert cfg.model["expand_scale"] == pytest.approx(2.1610954191879452)


def test_overrides_do_not_mutate_original():
    base = {"yolo": {"iou_thresh": 0.5, "ignore_thresh": [0.6, 0.5],
                     "anchors": [[1, 1]], "mask": [[0]]},
            "expand_scale": 1.5}
    out = apply_overrides(base, {"iou_thresh": 0.9})
    assert base["yolo"]["iou_thresh"] == 0.5
    assert out["yolo"]["iou_thresh"] == 0.9


def test_validation_rejects_bad_mask():
    bad = {"yolo": {"anchors": [[1, 2]], "mask": [[0, 5]],
                    "ignore_thresh": [0.5]}}
    with pytest.raises(ValueError):
        validate_model_config(bad)


def test_validation_rejects_bad_imgsize():
    bad = {"yolo": {"anchors": [[1, 2]], "mask": [[0]],
                    "ignore_thresh": [0.5]},
           "train_img_size": [[100, 100]]}
    with pytest.raises(ValueError):
        validate_model_config(bad)
