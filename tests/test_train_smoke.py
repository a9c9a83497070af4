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


def test_device_normalize_step_matches_host_normalize():
    """make_loss_fn(normalize=True) on raw uint8 images must equal the
    plain loss on host-normalized floats (identical numerics, the uint8
    path just moves the mean/std math into the jitted step)."""
    from mobilenet_yolo_tpu.train.step import make_loss_fn

    cfg = dict(CFG)
    cfg["normalize"] = {"mean": [0.45, 0.5, 0.55], "std": [0.9, 1.0, 1.1]}
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (2, 96, 96, 3)).astype(np.uint8)
    m = np.asarray(cfg["normalize"]["mean"], np.float32)
    s = np.asarray(cfg["normalize"]["std"], np.float32)
    host_norm = (raw.astype(np.float32) / 255.0 - m) / s

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(host_norm), train=False)
    gt = np.zeros((2, 4, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    n_gt = np.ones((2,), np.int32)

    plain = make_loss_fn(model, cfg)
    fused = make_loss_fn(model, cfg, normalize=True)
    loss_a, _ = plain(variables["params"], variables["batch_stats"],
                      jnp.asarray(host_norm), jnp.asarray(gt),
                      jnp.asarray(n_gt), train=False)
    loss_b, _ = fused(variables["params"], variables["batch_stats"],
                      jnp.asarray(raw), jnp.asarray(gt),
                      jnp.asarray(n_gt), train=False)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)


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


import pytest


@pytest.mark.parametrize("explicit_f32", [False, True])
def test_normalize_upcasts_bf16_input_for_f32_model(explicit_f32):
    """normalize=True on a float (bf16) input under an F32 model — dtype
    left None OR passed explicitly — runs the normalize math in f32
    (upcast), matching the host computation on the same quantized pixels
    exactly; the bf16 dtype is only kept when the model computes in it."""
    from mobilenet_yolo_tpu.train.step import make_loss_fn

    cfg = dict(CFG)
    cfg["normalize"] = {"mean": [0.45, 0.5, 0.55], "std": [0.9, 1.0, 1.1]}
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35,
                     dtype=jnp.float32 if explicit_f32 else None)
    rng = np.random.default_rng(0)
    raw_bf16 = jnp.asarray(
        rng.integers(0, 255, (2, 96, 96, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    m = np.asarray(cfg["normalize"]["mean"], np.float32)
    s = np.asarray(cfg["normalize"]["std"], np.float32)
    host_norm = ((np.asarray(raw_bf16, np.float32) / 255.0) - m) / s

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(host_norm), train=False)
    gt = np.zeros((2, 4, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    n_gt = np.ones((2,), np.int32)

    plain = make_loss_fn(model, cfg)
    fused = make_loss_fn(model, cfg, normalize=True)
    loss_a, _ = plain(variables["params"], variables["batch_stats"],
                      jnp.asarray(host_norm), jnp.asarray(gt),
                      jnp.asarray(n_gt), train=False)
    loss_b, _ = fused(variables["params"], variables["batch_stats"],
                      raw_bf16, jnp.asarray(gt), jnp.asarray(n_gt),
                      train=False)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
