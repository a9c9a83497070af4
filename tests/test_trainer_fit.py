"""Trainer.fit integration: epochs, eval cadence, checkpointing, logging."""

import os

import numpy as np

from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

CFG = {
    "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
    "yolo": {
        "num_classes": 3, "num_anchors": 3,
        "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
        "anchors": [[20, 24], [30, 30], [44, 40],
                    [6, 8], [10, 14], [14, 10]],
        "mask": [[0, 1, 2], [3, 4, 5]],
    },
}


def _loader_factory(seed_holder):
    def loader():
        seed_holder["n"] += 1
        for images, gt, n_gt in synthetic_batches(
                3, batch_size=4, img_size=64, num_classes=3,
                seed=seed_holder["n"]):
            yield {"images": images, "gt": gt, "n_gt": n_gt, "count": 4}
    return loader


def test_fit_runs_epochs_and_checkpoints(tmp_path):
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    ckpt_dir = str(tmp_path / "ckpt")
    tcfg = TrainerConfig(epochs=2, learning_rate=1e-3,
                         checkpoint_dir=ckpt_dir, eval_every=2,
                         tensorboard_dir=None)
    trainer = Trainer(model, CFG, ["background", "a", "b", "c"], tcfg,
                      verbose=False)
    seeds = {"n": 0}
    best = trainer.fit(_loader_factory(seeds), _loader_factory(seeds))
    assert np.isfinite(best)
    assert int(trainer.state.epoch) == 2
    # eval ran on epoch index 1 (eval_every=2 -> odd epochs)
    assert seeds["n"] >= 3  # 2 train epochs + >=1 eval pass

    # artifacts: log.txt rows and orbax checkpoints
    log_path = os.path.join(ckpt_dir, "log.txt")
    with open(log_path) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1 + 2  # header + one row per epoch

    # a fresh trainer resumes from the saved state
    trainer2 = Trainer(model, CFG, ["background", "a", "b", "c"], tcfg,
                       verbose=False)
    assert trainer2.maybe_resume()
    assert int(trainer2.state.epoch) == 2
    trainer2.ckpt.close()
