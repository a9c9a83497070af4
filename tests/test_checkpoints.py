"""Orbax checkpoint manager: save / restore / best-step semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.train import create_train_state
from mobilenet_yolo_tpu.train.checkpoints import CheckpointManager


def _mk_state():
    model = MBv2YOLO(num_classes=2, num_anchors=3, width_mult=0.35)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                  batch_size=1)
    return state


def test_save_restore_roundtrip(tmp_path):
    state = _mk_state()
    state = state.replace(epoch=jnp.asarray(7, jnp.int32),
                          best_acc=jnp.asarray(0.5, jnp.float32),
                          val_conf=jnp.asarray(0.08, jnp.float32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state, mAP=0.5, wait=True)

    template = _mk_state()
    restored = mgr.restore_latest(template)
    assert restored is not None
    assert int(restored.epoch) == 7
    assert float(restored.val_conf) == np.float32(0.08)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_latest_and_best_steps(tmp_path):
    state = _mk_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, state, mAP=0.3, wait=True)
    mgr.save(2, state, mAP=0.7, wait=True)
    mgr.save(3, state, mAP=0.5, wait=True)
    assert mgr.latest_step() == 3
    assert mgr.best_step() == 2
    mgr.close()


def test_restore_none_when_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore_latest(_mk_state()) is None
    mgr.close()


def test_midepoch_resume_bit_exact(tmp_path, rng):
    """Kill/resume mid-epoch reproduces the uninterrupted run bit-for-bit:
    run B checkpoints every 2 batches; run C restores B's batch-2 snapshot
    and finishes the epoch — C's final params must EQUAL the uninterrupted
    run A's (deterministic loader plan + index-keyed batch rng + exact
    loader fast-forward). Exceeds the reference's epoch-granular resume
    (train.py:138-153)."""
    import pytest
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(16):
            img = rng.integers(0, 255, (64, 72, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            labels = np.asarray([[1 + i % 2, 0.5, 0.5, 0.4, 0.5]],
                                np.float32)
            w.append_record(buf.tobytes(), labels)

    cfg = {
        "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
        "yolo": {
            "num_classes": 2, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[20, 24], [30, 30], [44, 40],
                        [6, 8], [10, 14], [14, 10]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    classes = ["background", "a", "b"]

    def make_loader():
        ds = DetectionDataset(RecordReader(d), phase="train")
        return Loader(ds, batch_size=4, transform_size=[[64, 64]],
                      mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1],
                      max_gt=10, prefetch=0, seed=3)

    def make_trainer(ckdir, every=0):
        model = MBv2YOLO(num_classes=2, num_anchors=3, width_mult=0.35)
        tcfg = TrainerConfig(epochs=1, learning_rate=1e-3,
                             checkpoint_dir=ckdir, tensorboard_dir=None,
                             checkpoint_every_batches=every)
        return Trainer(model, cfg, classes, tcfg, verbose=False)

    # A: uninterrupted
    ta = make_trainer(str(tmp_path / "a"))
    la = make_loader()
    ta.fit(lambda: la, lambda: make_loader())
    ta.ckpt.close()

    # B: same run with mid-epoch checkpointing every 2 batches
    tb = make_trainer(str(tmp_path / "b"), every=2)
    lb = make_loader()
    tb.fit(lambda: lb, lambda: make_loader())
    tb.ckpt.close()
    for a, b in zip(jax.tree_util.tree_leaves(ta.state.params),
                    jax.tree_util.tree_leaves(tb.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # C: "killed" after batch 2 of epoch 0 — restore B's mid-epoch
    # snapshot (step 0*1e6 + 2) and finish (into its own checkpoint dir so
    # C's saves don't collide with B's steps)
    tc = make_trainer(str(tmp_path / "c"), every=2)
    src = CheckpointManager(str(tmp_path / "b"))
    restored = src.restore(2, tc.state)
    src.close()
    assert int(restored.epoch) == 0 and int(restored.batch_idx) == 2
    tc.state = restored
    tc.best_acc = float(restored.best_acc)
    lc = make_loader()
    tc.fit(lambda: lc, lambda: make_loader())
    tc.ckpt.close()
    for a, c in zip(jax.tree_util.tree_leaves(ta.state.params),
                    jax.tree_util.tree_leaves(tc.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
