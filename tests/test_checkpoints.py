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
