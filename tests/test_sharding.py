"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.parallel import batch_sharding, create_mesh, shard_batch
from mobilenet_yolo_tpu.train import create_train_state, make_train_step

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


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_data_parallel_train_step_matches_single_device():
    """One DP step over 8 devices must produce the same params as the same
    step on one device (deterministic data, full-batch BN reduction)."""
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    batches = list(synthetic_batches(1, batch_size=8, img_size=64,
                                     num_classes=3, seed=3))
    images, gt, n_gt = batches[0]

    # single device
    state1, tx1 = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                     learning_rate=1e-3, batch_size=8)
    step1 = make_train_step(model, CFG, tx1)
    state1, m1 = step1(state1, jnp.asarray(images), jnp.asarray(gt),
                       jnp.asarray(n_gt))

    # 8-device mesh
    mesh = create_mesh()
    state8, tx8 = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                     learning_rate=1e-3, batch_size=8)
    step8 = make_train_step(model, CFG, tx8, mesh=mesh)
    sharded = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(gt),
                                 jnp.asarray(n_gt)))
    state8, m8 = step8(state8, *sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        # different all-reduce orders can flip the AdamW update sign on
        # near-zero gradients, moving a weight by exactly +-2*lr; allow one
        # lr-step of slack (2e-3 here) on isolated elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_batch_is_actually_sharded():
    mesh = create_mesh()
    x = jnp.zeros((16, 8, 8, 3))
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    assert xs.addressable_shards[0].data.shape[0] == 2


def test_tensor_parallel_step_matches_dp():
    """DP+TP (4x2 mesh, output channels sharded) must match pure DP."""
    from mobilenet_yolo_tpu.parallel import shard_over_model_axis
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    batches = list(synthetic_batches(1, batch_size=8, img_size=64,
                                     num_classes=3, seed=5))
    images, gt, n_gt = batches[0]

    mesh_dp = create_mesh()
    s_dp, tx_dp = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                     learning_rate=1e-3, batch_size=8)
    step_dp = make_train_step(model, CFG, tx_dp, mesh=mesh_dp)
    s_dp, m_dp = step_dp(s_dp, *shard_batch(
        mesh_dp, (jnp.asarray(images), jnp.asarray(gt), jnp.asarray(n_gt))))

    mesh_tp = create_mesh(n_data=4, n_model=2)
    s_tp, tx_tp = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                     learning_rate=1e-3, batch_size=8)
    s_tp = shard_over_model_axis(s_tp, mesh_tp, min_channels=128)
    # at least one kernel must actually be model-sharded
    shardings = [l.sharding.spec for l in jax.tree_util.tree_leaves(s_tp.params)
                 if hasattr(l, "sharding")]
    assert any("model" in str(s) for s in shardings), shardings
    step_tp = make_train_step(model, CFG, tx_tp, mesh=mesh_tp)
    s_tp, m_tp = step_tp(s_tp, *shard_batch(
        mesh_tp, (jnp.asarray(images), jnp.asarray(gt), jnp.asarray(n_gt))))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_mesh_sharded_predict_matches_single_device():
    """The eval/serving path sharded over the ``data`` axis returns the
    same detections as the single-device jit (eval/detector.py mesh=)."""
    from mobilenet_yolo_tpu.eval.detector import make_predict_fn
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    x = jnp.asarray(np.random.default_rng(11).uniform(
        0, 1, (8, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    p1 = make_predict_fn(model, CFG, top_k=32)
    d1, k1 = p1(variables, x, jnp.float32(0.01))

    mesh = create_mesh()
    p8 = make_predict_fn(model, CFG, top_k=32, mesh=mesh)
    d8, k8 = p8(variables, shard_batch(mesh, x), jnp.float32(0.01))
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(k8), np.asarray(k1))


def test_mesh_from_spec():
    from mobilenet_yolo_tpu.parallel import mesh_from_spec
    assert mesh_from_spec("none") is None
    assert mesh_from_spec("1") is None
    m = mesh_from_spec("auto", batch_size=16)
    assert m is not None and m.shape == {"data": 8, "model": 1}
    m = mesh_from_spec("4x2")
    assert m.shape == {"data": 4, "model": 2}
    import pytest
    with pytest.raises(ValueError):
        mesh_from_spec("auto", batch_size=12)   # 12 % 8 != 0
    with pytest.raises(ValueError):
        mesh_from_spec("16")                    # more than visible


def test_spatial_partitioning_forward():
    """SP analog for CNNs: shard the image HEIGHT over the mesh — GSPMD
    inserts the halo exchanges for the convolutions automatically. The
    sharded forward must match the single-device forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    x = jnp.asarray(np.random.default_rng(7).normal(
        0, 1, (2, 128, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    ref = model.apply(variables, x, train=False)

    mesh = create_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data")))  # shard H
    f = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    got = f(variables, xs)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5)
