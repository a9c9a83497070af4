import numpy as np
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.seg_metrics import (
    SegMetricAccumulator,
    mean_iou,
    seg_intersection_union,
)


def test_perfect_prediction_iou_1():
    truth = np.zeros((1, 4, 4, 2), np.float32)
    truth[0, :2, :, 0] = 1
    inter, union = seg_intersection_union(jnp.asarray(truth), jnp.asarray(truth))
    iou, miou = mean_iou(inter, union)
    assert miou == 1.0


def test_half_overlap():
    truth = np.zeros((1, 4, 4, 1), np.float32)
    truth[0, :2, :, 0] = 1  # top half
    pred = np.zeros((1, 4, 4, 1), np.float32)
    pred[0, 1:3, :, 0] = 1  # middle rows: 1 row overlap of 2+2 rows
    inter, union = seg_intersection_union(jnp.asarray(pred), jnp.asarray(truth))
    iou, miou = mean_iou(inter, union)
    np.testing.assert_allclose(float(iou[0]), 4 / 12)


def test_empty_class_counts_as_1():
    truth = np.zeros((1, 4, 4, 2), np.float32)
    truth[0, 0, 0, 0] = 1
    pred = truth.copy()
    inter, union = seg_intersection_union(jnp.asarray(pred), jnp.asarray(truth))
    iou, miou = mean_iou(inter, union)
    assert float(iou[1]) == 1.0  # class 1 absent everywhere
    assert miou == 1.0


def test_accumulator_across_batches():
    acc = SegMetricAccumulator(1)
    t1 = np.zeros((1, 2, 2, 1), np.float32)
    t1[0, 0, 0, 0] = 1
    p1 = np.zeros_like(t1)  # miss
    acc.add_batch(jnp.asarray(p1), jnp.asarray(t1))
    acc.add_batch(jnp.asarray(t1), jnp.asarray(t1))  # hit
    iou, miou = acc.compute()
    np.testing.assert_allclose(float(iou[0]), 0.5)
