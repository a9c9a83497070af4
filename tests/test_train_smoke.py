"""End-to-end training smoke: a few jitted steps on synthetic data must
reduce the loss (CPU-runnable; the identical code path runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.train import create_train_state, make_train_step
from mobilenet_yolo_tpu.train.schedule import learning_rate_for_epoch

CFG = {
    "img_w": 96, "img_h": 96, "iou_weighting": 0.02,
    "yolo": {
        "num_classes": 4, "num_anchors": 3,
        "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
        "anchors": [[34, 47], [48, 40], [70, 70],
                    [10, 12], [15, 25], [24, 18]],
        "mask": [[0, 1, 2], [3, 4, 5]],
    },
}


def test_train_smoke_loss_decreases():
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), (96, 96),
        learning_rate=2e-3, weight_decay=4e-4, batch_size=4)
    step = make_train_step(model, CFG, tx)

    losses = []
    batches = list(synthetic_batches(10, batch_size=4, img_size=96,
                                     num_classes=4, seed=1))
    for images, gt, n_gt in batches:
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(gt),
                              jnp.asarray(n_gt))
        loss = float(metrics["loss"])
        assert np.isfinite(loss), "loss went non-finite"
        losses.append(loss)

    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # metrics come from both heads
    assert "recall0" in metrics and "recall1" in metrics


def test_lr_schedule():
    # base recipe: no warmup, halve at {100,170,240} (train.py:467)
    assert learning_rate_for_epoch(8e-4, 0) == 8e-4
    assert learning_rate_for_epoch(8e-4, 99) == 8e-4
    assert learning_rate_for_epoch(8e-4, 100) == 4e-4
    assert learning_rate_for_epoch(8e-4, 170) == 2e-4
    assert learning_rate_for_epoch(8e-4, 250) == 1e-4
    # warm-up: start at base*0.5^n, double at each warmup epoch
    assert learning_rate_for_epoch(8e-4, 0, warm_up=[1, 2]) == 2e-4
    assert learning_rate_for_epoch(8e-4, 1, warm_up=[1, 2]) == 4e-4
    assert learning_rate_for_epoch(8e-4, 2, warm_up=[1, 2]) == 8e-4


def test_with_lr_updates_hyperparam():
    model = MBv2YOLO(num_classes=2, num_anchors=3, width_mult=0.35)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                   learning_rate=1e-3, batch_size=1)
    state = state.with_lr(5e-4)
    assert float(state.opt_state.hyperparams["learning_rate"]) == np.float32(5e-4)
