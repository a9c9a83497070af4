"""Detection end-to-end (decode -> NMS -> Evaluator -> mAP) and val_conf
controller tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.eval import Evaluator, adjust_confidence, make_predict_fn
from mobilenet_yolo_tpu.models import MBv2YOLO

CFG = {
    "yolo": {
        "num_classes": 4, "num_anchors": 3,
        "anchors": [[30, 40], [45, 45], [60, 70],
                    [8, 10], [14, 20], [20, 16]],
        "mask": [[0, 1, 2], [3, 4, 5]],
        "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
    },
}


def test_adjust_confidence():
    import pytest
    # too many predictions -> raise the gate (train.py:434-440)
    assert adjust_confidence(10, 40, 0.1) == pytest.approx(0.11)
    # too few -> lower it
    assert adjust_confidence(10, 15, 0.1) == pytest.approx(0.09)
    # floor at 0.01
    assert adjust_confidence(10, 15, 0.01) == pytest.approx(0.01)
    # in the band -> unchanged
    assert adjust_confidence(10, 25, 0.1) == pytest.approx(0.1)


def test_evaluator_perfect_synthetic():
    """Hand-built detections == GT must give mAP 1.0 through the Evaluator's
    padded-tensor plumbing."""
    ev = Evaluator(["background", "a", "b"])
    dets = np.zeros((2, 4, 7), np.float32)
    keep = np.zeros((2, 4), bool)
    gt = np.zeros((2, 3, 5), np.float32)
    n_gt = np.zeros((2,), np.int32)

    # image 0: one 'a' box
    gt[0, 0] = [1, 0.5, 0.5, 0.2, 0.2]
    n_gt[0] = 1
    dets[0, 0] = [0.4, 0.4, 0.6, 0.6, 0.9, 0.95, 0]
    keep[0, 0] = True
    # image 1: one 'b' box
    gt[1, 0] = [2, 0.3, 0.3, 0.2, 0.2]
    n_gt[1] = 1
    dets[1, 0] = [0.2, 0.2, 0.4, 0.4, 0.8, 0.9, 1]
    keep[1, 0] = True

    ev.add_batch(dets, keep, gt, n_gt)
    aps, mAP, tp, fp = ev.compute()
    assert mAP == 1.0
    assert ev.gt_box_count == 2 and ev.pred_box_count == 2


def test_predict_fn_end_to_end_shapes():
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    predict = make_predict_fn(model, CFG, top_k=64)
    dets, keep = predict(variables, x, jnp.float32(0.0))
    # 64x64 input: 2*2*3 + 4*4*3 = 60 candidates < top_k
    k = min(64, 60)
    assert dets.shape == (2, k, 7)
    assert keep.shape == (2, k)
    d = np.asarray(dets)
    # scores sorted descending within each image
    scores = d[..., 4] * d[..., 5]
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_predict_fn_seg_output():
    model = MBv2YOLO(num_classes=4, num_anchors=3, seg_num_classes=2,
                     width_mult=0.35)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    predict = make_predict_fn(model, CFG, top_k=32)
    out = predict(variables, x, jnp.float32(0.5))
    assert len(out) == 3
    seg = np.asarray(out[2])
    assert seg.shape == (1, 4, 4, 2)
    assert (seg >= 0).all() and (seg <= 1).all()  # sigmoid maps


def test_predict_fn_device_normalization_matches_host():
    """normalize=True on raw uint8 images == host-side normalization."""
    import numpy as np
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    cfg = dict(CFG, normalize={"mean": [0.4, 0.5, 0.6], "std": [0.2, 0.25, 0.3]})
    mean = np.asarray(cfg["normalize"]["mean"], np.float32)
    std = np.asarray(cfg["normalize"]["std"], np.float32)
    host_norm = (raw.astype(np.float32) / 255.0 - mean) / std

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 64, 64, 3)), train=False)
    p_host = make_predict_fn(model, cfg, top_k=32)
    p_dev = make_predict_fn(model, cfg, top_k=32, normalize=True)
    d1, k1 = p_host(variables, jnp.asarray(host_norm), jnp.float32(0.1))
    d2, k2 = p_dev(variables, jnp.asarray(raw), jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
