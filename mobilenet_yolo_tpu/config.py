"""Two-level YAML config system.

Mirrors the reference contract (train.py:55-80 in the reference repo):

* a *data yaml* describes dataset paths, class maps, file extensions,
  segmentation flags and points at a *model yaml* via ``model_config_path``
* the *model yaml* holds image size, batch size, the multiscale training-size
  list, augmentation knobs and the YOLO head hyperparameters (anchors, masks,
  ignore/iou thresholds, iou_weighting)
* flat override dicts (CLI flags, HPO tuner parameters) are spliced on top,
  with the same key names the reference exposes to NNI
  (reference search_space.json: learning_rate, ignore_thresh_1/2, iou_thresh,
  expand_scale, mosaic_num, weight_decay, iou_weighting).

Configs stay plain nested dicts so existing reference YAML files port
verbatim; light validation happens in :func:`validate_model_config`.
"""

from __future__ import annotations

import copy
import os
from dataclasses import dataclass, field
from typing import Any

import yaml

# Overrides the reference splices into the model config (train.py:69-80).
_MODEL_OVERRIDE_KEYS = {
    "ignore_thresh_1": ("yolo", "ignore_thresh", 0),
    "ignore_thresh_2": ("yolo", "ignore_thresh", 1),
    "iou_thresh": ("yolo", "iou_thresh"),
    "expand_scale": ("expand_scale",),
    "mosaic_num": ("mosaic_num",),
    "iou_weighting": ("iou_weighting",),
}


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def default_data_yaml(name: str = "voc_data.yaml") -> str:
    """Absolute path of a bundled config (works from any cwd)."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "configs", name)


@dataclass
class Config:
    """Merged view over a (data yaml, model yaml) pair."""

    data: dict = field(default_factory=dict)
    model: dict = field(default_factory=dict)
    data_yaml_path: str = ""
    model_yaml_path: str = ""

    # -- convenience accessors ------------------------------------------------
    @property
    def classes(self) -> list[str]:
        """Class names *with* the background class at index 0.

        The reference inserts 'background' in front of the data-yaml map
        (train.py:57-58), making stored labels 1-indexed.
        """
        names = list(self.data["classes"]["map"])
        if not names or names[0] != "background":
            names = ["background"] + names
        return names

    @property
    def num_classes(self) -> int:
        return int(self.model["yolo"]["num_classes"])

    @property
    def img_size(self) -> tuple[int, int]:
        return int(self.model["img_w"]), int(self.model["img_h"])

    @property
    def anchors(self) -> list[list[float]]:
        return [list(a) for a in self.model["yolo"]["anchors"]]

    @property
    def masks(self) -> list[list[int]]:
        return [list(m) for m in self.model["yolo"]["mask"]]

    @property
    def segmentation_enabled(self) -> bool:
        return bool(self.data.get("segmentation_enable", False))

    @property
    def seg_num_classes(self) -> int:
        if "seg" in self.model:
            return int(self.model["seg"]["num_classes"])
        return int(self.data.get("segmentation_num_classes", 0))


def apply_overrides(model_cfg: dict, overrides: dict[str, Any]) -> dict:
    """Splice flat override keys into a model config (reference train.py:69-80).

    Unknown keys are ignored here (they may be trainer-level flags such as
    learning_rate / weight_decay, consumed by the training driver).
    """
    cfg = copy.deepcopy(model_cfg)
    for key, value in overrides.items():
        if value is None or key not in _MODEL_OVERRIDE_KEYS:
            continue
        path = _MODEL_OVERRIDE_KEYS[key]
        node = cfg
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = value
    return cfg


def validate_model_config(cfg: dict) -> None:
    yolo = cfg["yolo"]
    n_anchor = len(yolo["anchors"])
    for m in yolo["mask"]:
        for idx in m:
            if not 0 <= idx < n_anchor:
                raise ValueError(f"anchor mask index {idx} out of range 0..{n_anchor-1}")
    if len(yolo["ignore_thresh"]) != len(yolo["mask"]):
        raise ValueError("ignore_thresh must have one entry per head")
    if "train_img_size" in cfg:
        for w, h in cfg["train_img_size"]:
            if w % 32 or h % 32:
                raise ValueError("train_img_size entries must be multiples of 32")


def load_config(data_yaml: str, overrides: dict[str, Any] | None = None) -> Config:
    """Load the two-level config exactly like the reference driver does."""
    data_cfg = load_yaml(data_yaml)
    model_path = data_cfg["model_config_path"]
    if not os.path.isabs(model_path):
        # resolve relative to the data yaml first, then cwd (reference uses cwd)
        cand = os.path.join(os.path.dirname(os.path.abspath(data_yaml)), model_path)
        for base_cand in (cand, model_path):
            if os.path.isfile(base_cand):
                model_path = base_cand
                break
    model_cfg = load_yaml(model_path)
    if overrides:
        model_cfg = apply_overrides(model_cfg, overrides)
    validate_model_config(model_cfg)
    return Config(data=data_cfg, model=model_cfg,
                  data_yaml_path=data_yaml, model_yaml_path=model_path)
