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


def _loader_factory(seed_holder, batch_size=4):
    def loader():
        seed_holder["n"] += 1
        for images, gt, n_gt in synthetic_batches(
                3, batch_size=batch_size, img_size=64, num_classes=3,
                seed=seed_holder["n"]):
            yield {"images": images, "gt": gt, "n_gt": n_gt,
                   "count": batch_size}
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


def test_train_epoch_device_pixel_aug(tmp_path):
    """Trainer wiring for --device-pixel-aug: uint8 batches carrying
    host-planned jitter programs (Loader._collate's jitter_op /
    jitter_factor) drive the planned-order device jitter step."""
    from mobilenet_yolo_tpu.data import augment

    cfg = dict(CFG)
    cfg["normalize"] = {"mean": [0.5] * 3, "std": [1.0] * 3}
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    tcfg = TrainerConfig(epochs=1, learning_rate=1e-3,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         tensorboard_dir=None)
    trainer = Trainer(model, cfg, ["background", "a", "b", "c"], tcfg,
                      verbose=False, device_normalize=True,
                      device_pixel_aug=True)

    rng = np.random.default_rng(3)

    def batches():
        for images, gt, n_gt in synthetic_batches(
                3, batch_size=4, img_size=64, num_classes=3, seed=5):
            raw = np.clip((images + 0.5) * 255.0, 0, 255).astype(np.uint8)
            plans = [augment.sample_photometric(rng) for _ in range(4)]
            yield {"images": raw, "gt": gt, "n_gt": n_gt,
                   "jitter_op": np.stack([p[0] for p in plans]),
                   "jitter_factor": np.stack([p[1] for p in plans])}

    avgs = trainer.train_epoch(batches(), 0)
    assert np.isfinite(avgs["loss"])
    trainer.ckpt.close()


def test_fit_on_mesh_matches_single_device(tmp_path):
    """Full fit (train epochs + alternate-epoch mesh-sharded eval +
    checkpoint + resume) on the virtual 8-device mesh reproduces the
    single-device run's mAP — the end-to-end counterpart of the per-step
    parity test in test_sharding.py."""
    from mobilenet_yolo_tpu.parallel import create_mesh

    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    classes = ["background", "a", "b", "c"]

    def run(mesh, ckpt_dir):
        tcfg = TrainerConfig(epochs=2, learning_rate=1e-3,
                             checkpoint_dir=ckpt_dir, eval_every=2,
                             tensorboard_dir=None)
        trainer = Trainer(model, CFG, classes, tcfg, mesh=mesh,
                          verbose=False)
        seeds = {"n": 0}
        best = trainer.fit(_loader_factory(seeds, batch_size=8),
                           _loader_factory(seeds, batch_size=8))
        return best, trainer, tcfg

    best1, tr1, _ = run(None, str(tmp_path / "single"))
    best8, tr8, tcfg8 = run(create_mesh(), str(tmp_path / "mesh"))
    assert int(tr8.state.epoch) == 2
    # per-step DP parity is float-exact-ish, but AdamW flips the update
    # sign on near-zero gradients under a different all-reduce order
    # (+-2*lr per element, see test_sharding.py) and six steps compound it
    # — so the random-init mAPs agree to noise level, not bit-for-bit
    assert np.isclose(best8, best1, atol=5e-3), (best8, best1)
    # the val_conf controller moves in 0.01 quanta off integer box counts
    np.testing.assert_allclose(float(tr8.state.val_conf),
                               float(tr1.state.val_conf), atol=0.011)

    # resume on the mesh from the mesh run's checkpoint
    trainer3 = Trainer(model, CFG, classes, tcfg8, mesh=create_mesh(),
                       verbose=False)
    assert trainer3.maybe_resume()
    assert int(trainer3.state.epoch) == 2
    # one more mesh-sharded eval pass on the restored state runs clean
    seeds = {"n": 100}
    mAP, _ = trainer3.evaluate(_loader_factory(seeds, batch_size=8)())
    assert np.isfinite(mAP)
    trainer3.ckpt.close()


def test_profile_steps_writes_trace(tmp_path):
    """TrainerConfig.profile_steps captures a one-shot jax.profiler device
    trace of warm train steps into <tensorboard_dir>/profile."""
    import glob

    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    tcfg = TrainerConfig(epochs=1, learning_rate=1e-3,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         tensorboard_dir=str(tmp_path / "tb"),
                         eval_every=2, profile_steps=1)
    trainer = Trainer(model, CFG, ["background", "a", "b", "c"], tcfg,
                      verbose=False)
    seeds = {"n": 0}
    trainer.fit(_loader_factory(seeds), _loader_factory(seeds))
    trainer.ckpt.close()
    xplanes = glob.glob(str(tmp_path / "tb" / "profile" / "**" /
                            "*.xplane.pb"), recursive=True)
    assert xplanes, "no xplane trace written"
    assert trainer._profiled


def test_profile_steps_longer_than_epoch(tmp_path):
    """profile_steps >= the epoch's batches: the trace is closed at epoch
    end (shorter capture) instead of leaking an open trace that would
    crash the next epoch's start_trace."""
    import glob

    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    tcfg = TrainerConfig(epochs=2, learning_rate=1e-3,
                         checkpoint_dir=str(tmp_path / "ckpt"),
                         tensorboard_dir=str(tmp_path / "tb"),
                         eval_every=2, profile_steps=10)  # > 3 batches
    trainer = Trainer(model, CFG, ["background", "a", "b", "c"], tcfg,
                      verbose=False)
    seeds = {"n": 0}
    trainer.fit(_loader_factory(seeds), _loader_factory(seeds))
    trainer.ckpt.close()
    assert trainer._profiled and not trainer._trace_open
    assert glob.glob(str(tmp_path / "tb" / "profile" / "**" /
                         "*.xplane.pb"), recursive=True)


def test_device_pixel_aug_batch_contract(tmp_path):
    """A device_pixel_aug Trainer rejects batches without jitter plans
    (and the inverse: plan-carrying batches without device_pixel_aug),
    instead of KeyError / silently dropping augmentation."""
    import pytest

    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    tcfg = TrainerConfig(epochs=1, learning_rate=1e-3,
                         checkpoint_dir=str(tmp_path / "ck"),
                         tensorboard_dir=None)
    seeds = {"n": 0}

    t1 = Trainer(model, CFG, ["background", "a", "b", "c"], tcfg,
                 verbose=False, device_normalize=True,
                 device_pixel_aug=True)
    with pytest.raises(ValueError, match="jitter plans"):
        t1.train_epoch(_loader_factory(seeds)(), epoch=0)
    t1.ckpt.close()

    t2 = Trainer(model, CFG, ["background", "a", "b", "c"], tcfg,
                 verbose=False)

    def plan_loader():
        for b in _loader_factory(seeds)():
            b["jitter_op"] = np.full((4, 5), -1, np.int32)
            b["jitter_factor"] = np.ones((4, 5), np.float32)
            yield b
    with pytest.raises(ValueError, match="device_pixel_aug=False"):
        t2.train_epoch(plan_loader(), epoch=0)
    t2.ckpt.close()
