"""EMA eval-weights tests (beyond-reference training stabilizer).

``create_train_state(ema=True)`` seeds ema_params with the init params;
train steps built with ``ema_decay`` update them as
``ema = d*ema + (1-d)*params``; the Trainer evaluates with (and the
serving loaders prefer) the averaged weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.train import create_train_state, make_train_step

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


def _model_and_batch():
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    images, gt, n_gt = next(iter(synthetic_batches(
        1, batch_size=2, img_size=96, num_classes=4, seed=1)))
    return model, (jnp.asarray(images), jnp.asarray(gt), jnp.asarray(n_gt))


def test_ema_update_math():
    """After one step from ema0 == p0: ema1 == d*p0 + (1-d)*p1, leafwise."""
    model, batch = _model_and_batch()
    d = 0.75
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (96, 96),
                                   learning_rate=2e-3, batch_size=2,
                                   ema=True)
    p0 = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, CFG, tx, ema_decay=d, ema_ramp=0)
    new_state, _ = step(state, *batch)

    p1 = jax.tree.map(np.asarray, new_state.params)
    ema1 = jax.tree.map(np.asarray, new_state.ema_params)

    def check(a0, a1, e1):
        np.testing.assert_allclose(e1, d * a0 + (1 - d) * a1,
                                   rtol=1e-5, atol=1e-7)
    jax.tree.map(check, p0, p1, ema1)
    # and the EMA genuinely lags the live params
    l0 = jax.tree.leaves(p1)[0]
    assert not np.allclose(jax.tree.leaves(ema1)[0], l0)


def test_ema_ramp_warmup():
    """With the default warmup ramp, the effective decay after step t is
    d * (1 - exp(-t / ramp)) — at t=1, ramp=2000 the EMA is ~the live
    params (not 75% random init like the constant-decay form)."""
    model, batch = _model_and_batch()
    d, ramp = 0.75, 2000.0
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (96, 96),
                                   learning_rate=2e-3, batch_size=2,
                                   ema=True)
    p0 = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, CFG, tx, ema_decay=d, ema_ramp=ramp)
    new_state, _ = step(state, *batch)
    p1 = jax.tree.map(np.asarray, new_state.params)
    ema1 = jax.tree.map(np.asarray, new_state.ema_params)
    d1 = d * (1.0 - np.exp(-1.0 / ramp))

    def check(a0, a1, e1):
        np.testing.assert_allclose(e1, d1 * a0 + (1 - d1) * a1,
                                   rtol=1e-5, atol=1e-7)
    jax.tree.map(check, p0, p1, ema1)


def test_ema_off_keeps_none():
    model, batch = _model_and_batch()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (96, 96),
                                   batch_size=2)
    step = make_train_step(model, CFG, tx)
    new_state, _ = step(state, *batch)
    assert new_state.ema_params is None


def test_ema_decay_without_state_raises():
    model, batch = _model_and_batch()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (96, 96),
                                   batch_size=2)  # no ema field
    step = make_train_step(model, CFG, tx, ema_decay=0.9)
    with pytest.raises(ValueError, match="ema_params"):
        step(state, *batch)


def test_geometry_step_updates_ema(rng):
    """The device-geometry step maintains the same EMA."""
    from mobilenet_yolo_tpu.train.step import (GEOMETRY_BATCH_KEYS,
                                               make_geometry_train_step)

    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    d = 0.5
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                   learning_rate=2e-3, batch_size=2,
                                   ema=True)
    p0 = jax.tree.map(np.asarray, state.params)
    step = make_geometry_train_step(model, CFG, tx, fused_aug=False,
                                    ema_decay=d, ema_ramp=0)
    b = 2
    full = np.tile(np.float32([0, 0, 1, 1]), (b, 4, 1))
    act = np.zeros((b, 4), bool)
    act[:, 0] = True
    gt = np.zeros((b, 4, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    geom = dict(
        slots=rng.integers(0, 255, (b, 4, 64, 64, 3)).astype(np.uint8),
        src_rect=full, dst_rect=full, fill_rect=full,
        fill_color=np.full((b, 4, 3), 127.5, np.float32),
        fill_from_mean=np.zeros((b, 4), bool),
        flip=np.zeros((b, 4), bool), active=act,
        noise_gate=np.zeros((b, 4), bool),
        noise_scale=np.zeros((b, 4), np.float32),
        noise_per_channel=np.zeros((b, 4), bool),
        jitter_op=np.full((b, 4, 5), -1, np.int32),
        jitter_factor=np.ones((b, 4, 5), np.float32))
    args = tuple(jnp.asarray(geom[k]) for k in GEOMETRY_BATCH_KEYS)
    new_state, _ = step(state, *args, jnp.asarray(gt),
                        jnp.asarray(np.ones(b, np.int32)),
                        jax.random.PRNGKey(1), out_hw=(64, 64))
    p1 = jax.tree.map(np.asarray, new_state.params)
    ema1 = jax.tree.map(np.asarray, new_state.ema_params)

    def check(a0, a1, e1):
        np.testing.assert_allclose(e1, d * a0 + (1 - d) * a1,
                                   rtol=1e-5, atol=1e-7)
    jax.tree.map(check, p0, p1, ema1)


FIT_CFG = {
    "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
    "yolo": {
        "num_classes": 3, "num_anchors": 3,
        "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
        "anchors": [[20, 24], [30, 30], [44, 40],
                    [6, 8], [10, 14], [14, 10]],
        "mask": [[0, 1, 2], [3, 4, 5]],
    },
}


def _loader_factory(seed_holder, batch_size=4):
    def loader():
        seed_holder["n"] += 1
        for images, gt, n_gt in synthetic_batches(
                3, batch_size=batch_size, img_size=64, num_classes=3,
                seed=seed_holder["n"]):
            yield {"images": images, "gt": gt, "n_gt": n_gt,
                   "count": batch_size}
    return loader


def test_trainer_fit_with_ema_and_raw_restore(tmp_path):
    """Trainer(ema_decay>0) trains, evaluates with the EMA weights,
    checkpoints them, and the template-free raw restore used by the
    serving/eval CLIs returns them; a non-EMA checkpoint restores with
    ema_params None."""
    from mobilenet_yolo_tpu.train.checkpoints import CheckpointManager
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    cfg = TrainerConfig(epochs=2, learning_rate=2e-3,
                        checkpoint_dir=str(tmp_path / "ck"),
                        tensorboard_dir=None, eval_every=2,
                        ema_decay=0.9)
    trainer = Trainer(model, FIT_CFG, ["bg", "a", "b"], cfg,
                      verbose=False)
    seeds = {"n": 0}
    trainer.fit(_loader_factory(seeds), _loader_factory(seeds))
    assert trainer.state.ema_params is not None
    # live and averaged weights have diverged
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    assert not np.allclose(leaf(trainer.state.params),
                           leaf(trainer.state.ema_params))

    raw = CheckpointManager(cfg.checkpoint_dir).restore_latest_raw()
    assert raw is not None and raw.get("ema_params") is not None
    np.testing.assert_allclose(leaf(raw["ema_params"]),
                               leaf(trainer.state.ema_params), rtol=1e-6)

    # non-EMA run: raw restore must come back without ema weights
    cfg2 = TrainerConfig(epochs=1, learning_rate=2e-3,
                         checkpoint_dir=str(tmp_path / "ck2"),
                         tensorboard_dir=None, eval_every=2)
    t2 = Trainer(model, FIT_CFG, ["bg", "a", "b"], cfg2, verbose=False)
    t2.fit(_loader_factory(seeds), _loader_factory(seeds))
    raw2 = CheckpointManager(cfg2.checkpoint_dir).restore_latest_raw()
    assert raw2 is not None and raw2.get("ema_params") is None
    assert raw2["params"] is not None
    trainer.ckpt.close()
    t2.ckpt.close()


def test_resume_across_ema_toggle(tmp_path):
    """Checkpoints survive TrainState schema drift: a run saved WITH EMA
    resumes into a non-EMA trainer (field dropped), and a non-EMA
    checkpoint resumes into an EMA trainer (average seeded from the
    restored params) — restore_latest_flexible."""
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    seeds = {"n": 0}
    names = ["bg", "a", "b"]

    cfg_ema = TrainerConfig(epochs=1, learning_rate=2e-3,
                            checkpoint_dir=str(tmp_path / "ck_ema"),
                            tensorboard_dir=None, ema_decay=0.9)
    t = Trainer(model, FIT_CFG, names, cfg_ema, verbose=False)
    t.fit(_loader_factory(seeds), _loader_factory(seeds))
    t.ckpt.close()

    cfg_off = TrainerConfig(epochs=1, learning_rate=2e-3,
                            checkpoint_dir=str(tmp_path / "ck_ema"),
                            tensorboard_dir=None)       # EMA off
    t2 = Trainer(model, FIT_CFG, names, cfg_off, verbose=False)
    assert t2.maybe_resume()
    assert t2.state.ema_params is None
    assert int(t2.state.epoch) == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(t2.state.params)[0]),
        np.asarray(jax.tree.leaves(t.state.params)[0]))
    t2.ckpt.close()

    cfg_plain = TrainerConfig(epochs=1, learning_rate=2e-3,
                              checkpoint_dir=str(tmp_path / "ck_plain"),
                              tensorboard_dir=None)
    t3 = Trainer(model, FIT_CFG, names, cfg_plain, verbose=False)
    t3.fit(_loader_factory(seeds), _loader_factory(seeds))
    t3.ckpt.close()

    cfg_on = TrainerConfig(epochs=1, learning_rate=2e-3,
                           checkpoint_dir=str(tmp_path / "ck_plain"),
                           tensorboard_dir=None, ema_decay=0.9)
    t4 = Trainer(model, FIT_CFG, names, cfg_on, verbose=False)
    assert t4.maybe_resume()
    assert t4.state.ema_params is not None
    # EMA seeded from the RESTORED params, not the fresh init
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(t4.state.ema_params)[0]),
        np.asarray(jax.tree.leaves(t3.state.params)[0]))
    t4.ckpt.close()
