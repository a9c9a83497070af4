"""HPO seam: tuner-override merge and report hooks."""

from mobilenet_yolo_tpu.train.hpo import (
    NoOpReport,
    get_tuner_overrides,
    make_report_hook,
)
from mobilenet_yolo_tpu.config import apply_overrides


def test_overrides_empty_outside_nni():
    # no NNI in this environment -> empty dict, no crash
    assert get_tuner_overrides() == {}


def test_report_hook_fallback():
    hook = make_report_hook()
    # NoOp outside an NNI trial; both calls must be safe
    hook.intermediate(0.5)
    hook.final(0.7)
    assert isinstance(hook, NoOpReport)


def test_search_space_keys_map_to_config():
    """Every model-level key in hpo/search_space.json must be consumable
    by the config override seam (trainer-level keys are handled by the
    driver)."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "hpo",
                        "search_space.json")
    with open(path) as f:
        space = json.load(f)
    trainer_keys = {"learning_rate", "weight_decay"}
    base = {
        "yolo": {"iou_thresh": 0.5, "ignore_thresh": [0.6, 0.5],
                 "anchors": [[1, 2]], "mask": [[0]]},
        "expand_scale": 1.5, "mosaic_num": [1], "iou_weighting": 0.02,
    }
    for key in space:
        if key in trainer_keys:
            continue
        out = apply_overrides(base, {key: 0.42 if "num" not in key else [2]})
        assert out != base, f"override {key} had no effect"
