"""cli/eval.py must reproduce Trainer.evaluate exactly (same Evaluator
driver, difficult flag, nms_top_k, val_conf semantics) — the round-2 drift
(difficult flag silently dropped by the standalone CLI) stays fixed."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_shard(d, rng, n=6, seg=False):
    from mobilenet_yolo_tpu.data.records import RecordWriter
    with RecordWriter(str(d)) as w:
        for i in range(n):
            img = rng.integers(0, 255, (64, 64, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            # one easy + (every other image) one difficult GT
            labels = [[1 + i % 3, 0.4, 0.4, 0.3, 0.3, 0.0]]
            if i % 2:
                labels.append([1 + (i + 1) % 3, 0.7, 0.7, 0.2, 0.2, 1.0])
            seg_bytes = None
            if seg:
                ids = rng.integers(0, 3, (64, 64), np.uint8)
                ok2, pbuf = cv2.imencode(".png", ids)
                seg_bytes = pbuf.tobytes()
            w.append_record(buf.tobytes(), np.asarray(labels, np.float32),
                            seg_bytes=seg_bytes)


MODEL_YAML = """\
img_h: 64
img_w: 64
batch_size: 4
train_img_size: [[64, 64]]
expand_scale: 1.5
mosaic_num: [1]
iou_weighting: 0.02
nms_top_k: 64
normalize:
  mean: [0.5, 0.5, 0.5]
  std: [1.0, 1.0, 1.0]
yolo:
  num_classes: 3
  num_anchors: 3
  ignore_thresh: [0.6, 0.55]
  iou_thresh: 0.55
  anchors: [[20, 24], [30, 30], [44, 40], [6, 8], [10, 14], [14, 10]]
  classes: 3
  mask: [[0, 1, 2], [3, 4, 5]]
"""


def _write_configs(tmp_path, shard, seg=False):
    model_yaml = MODEL_YAML
    if seg:
        model_yaml += "seg:\n  num_classes: 2\n"
    (tmp_path / "model.yaml").write_text(model_yaml)
    data = {
        "trainval_dataset_path": {"lmdb": str(shard)},
        "test_dataset_path": {"lmdb": str(shard)},
        "segmentation_enable": seg,
        "segmentation_num_classes": 2 if seg else 0,
        "classes": {"original": ["a", "b", "c"], "map": ["a", "b", "c"]},
        "model_config_path": str(tmp_path / "model.yaml"),
    }
    import yaml
    (tmp_path / "data.yaml").write_text(yaml.safe_dump(data))
    return str(tmp_path / "data.yaml")


def test_cli_eval_matches_trainer_evaluate(tmp_path, rng, capsys):
    from mobilenet_yolo_tpu.cli import eval as cli_eval
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    shard = tmp_path / "shard"
    _write_shard(shard, rng)
    data_yaml = _write_configs(tmp_path, shard)

    # --- trainer-side reference numbers (same random-init weights: both
    # paths init with PRNGKey(0))
    cfg = load_config(data_yaml)
    model = build_model(cfg.model, "mbv2")
    tcfg = TrainerConfig(checkpoint_dir=str(tmp_path / "ck"),
                         tensorboard_dir=None,
                         nms_top_k=int(cfg.model["nms_top_k"]))
    trainer = Trainer(model, cfg.model, cfg.classes, tcfg, verbose=False)
    import jax.numpy as jnp
    trainer.state = trainer.state.replace(val_conf=jnp.float32(0.05))
    norm = cfg.model["normalize"]
    loader = Loader(DetectionDataset(RecordReader(str(shard)), phase="test"),
                    4, [[64, 64]], norm["mean"], norm["std"], shuffle=False,
                    pad_final=False)
    want_mAP, want_aps = trainer.evaluate(loader)
    trainer.ckpt.close()

    # --mesh none: this asserts 1e-9 protocol equality vs the meshless
    # trainer path; sharded-vs-single float equivalence has its own
    # tolerance-aware test (test_sharding.py). The seg test below keeps
    # the default --mesh auto, exercising the CLI's sharded predict.
    got_mAP = cli_eval.main(["-y", data_yaml, "--random-weights",
                             "--val-conf", "0.05", "--batch-size", "4",
                             "--mesh", "none"])
    out = json.loads(capsys.readouterr().out)
    assert got_mAP == pytest.approx(want_mAP, abs=1e-9)
    for k, v in want_aps.items():
        assert out["APs"][k] == pytest.approx(v, abs=1e-9)
    assert "seg_mIoU" not in out


def test_cli_eval_reports_seg_miou(tmp_path, rng, capsys):
    """Multi-task checkpoints get a seg mIoU from the standalone CLI too."""
    from mobilenet_yolo_tpu.cli import eval as cli_eval

    shard = tmp_path / "shard"
    _write_shard(shard, rng, seg=True)
    data_yaml = _write_configs(tmp_path, shard, seg=True)
    mAP = cli_eval.main(["-y", data_yaml, "--random-weights",
                         "--val-conf", "0.05", "--batch-size", "4"])
    out = json.loads(capsys.readouterr().out)
    assert np.isfinite(mAP)
    assert "seg_mIoU" in out and 0.0 <= out["seg_mIoU"] <= 1.0


def test_cli_eval_coco_ap_flag(tmp_path, rng, capsys):
    """--coco-ap reports the COCO metric family alongside the VOC mAP and
    matches a direct Evaluator.compute_coco over the same detections."""
    from mobilenet_yolo_tpu.cli import eval as cli_eval

    shard = tmp_path / "shard"
    _write_shard(shard, rng)
    data_yaml = _write_configs(tmp_path, shard)

    cli_eval.main(["-y", data_yaml, "--random-weights",
                   "--val-conf", "0.05", "--batch-size", "4",
                   "--mesh", "none", "--coco-ap"])
    out = json.loads(capsys.readouterr().out)
    coco = out["coco"]
    assert set(coco) == {"AP", "AP50", "AP75", "APsmall", "APmedium",
                         "APlarge", "per_class"}
    # protocol sanity on real pipeline output: AP50 upper-bounds the
    # IoU-averaged AP, which upper-bounds AP75
    assert coco["AP50"] + 1e-9 >= coco["AP"] >= coco["AP75"] - 1e-9
    assert 0.0 <= coco["AP"] <= 1.0
    # area-range APs: -1.0 (no GT in range) or a valid AP
    for k in ("APsmall", "APmedium", "APlarge"):
        assert coco[k] == -1.0 or 0.0 <= coco[k] <= 1.0
