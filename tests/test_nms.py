import numpy as np
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.nms import batched_nms


def _iou_np(a, b):
    lower = np.maximum(a[:2], b[:2])
    upper = np.minimum(a[2:], b[2:])
    wh = np.clip(upper - lower, 0, None)
    inter = wh[0] * wh[1]
    ua = (a[2] - a[0]) * (a[3] - a[1])
    ub = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (ua + ub - inter)


def oracle_nms(preds, val_conf, iou_threshold=0.45):
    """Per-image per-class greedy hard NMS (reference utils/box.py:11-31)."""
    kept = []
    cand = preds[preds[:, 4] > val_conf]
    for c in np.unique(cand[:, 6]):
        rows = cand[cand[:, 6] == c]
        scores = rows[:, 4] * rows[:, 5]
        order = np.argsort(-scores)
        rows = rows[order]
        suppressed = np.zeros(len(rows), bool)
        for i in range(len(rows)):
            if suppressed[i]:
                continue
            kept.append(rows[i])
            for j in range(i + 1, len(rows)):
                if _iou_np(rows[i, :4], rows[j, :4]) > iou_threshold:
                    suppressed[j] = True
    return np.asarray(kept).reshape(-1, 7)


def _random_preds(rng, B=2, N=120, C=6):
    boxes = rng.uniform(0, 1, size=(B, N, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(0.02, 0.4, size=(B, N, 2))
    conf = rng.uniform(0, 1, size=(B, N, 1)).astype(np.float32)
    cls_score = rng.uniform(0.2, 1, size=(B, N, 1)).astype(np.float32)
    cls_idx = rng.integers(0, C, size=(B, N, 1)).astype(np.float32)
    return np.concatenate([boxes, conf, cls_score, cls_idx], -1)


def test_nms_matches_oracle(rng):
    preds = _random_preds(rng)
    val_conf = 0.35
    dets, keep = batched_nms(jnp.asarray(preds), val_conf, top_k=128)
    dets = np.asarray(dets)
    keep = np.asarray(keep)
    for b in range(preds.shape[0]):
        got = dets[b][keep[b]]
        want = oracle_nms(preds[b], val_conf)
        # compare as sets sorted by (cls, score)
        def canon(x):
            order = np.lexsort((-(x[:, 4] * x[:, 5]), x[:, 6]))
            return x[order]
        got, want = canon(got), canon(want)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nms_low_conf_floor_matches_uncapped_oracle(rng):
    """Early-training eval regime: val_conf at the 0.01 floor passes many
    hundreds of candidates per image. The default eval top_k (512, see
    TrainerConfig.nms_top_k) must cover the post-gate candidate count so
    the detection set is IDENTICAL to the reference's uncapped host NMS
    (utils/box.py:11-31), not silently clipped."""
    preds = _random_preds(rng, B=2, N=450, C=20)
    val_conf = 0.01  # the controller's floor (reference train.py:434-440)
    dets, keep = batched_nms(jnp.asarray(preds), val_conf, top_k=512)
    dets = np.asarray(dets)
    keep = np.asarray(keep)
    for b in range(preds.shape[0]):
        got = dets[b][keep[b]]
        want = oracle_nms(preds[b], val_conf)

        def canon(x):
            order = np.lexsort((-(x[:, 4] * x[:, 5]), x[:, 6]))
            return x[order]
        got, want = canon(got), canon(want)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nms_identical_boxes_same_class_suppressed():
    p = np.zeros((1, 3, 7), np.float32)
    p[0, :, :4] = [0.1, 0.1, 0.5, 0.5]
    p[0, :, 4] = [0.9, 0.8, 0.7]
    p[0, :, 5] = 1.0
    p[0, :, 6] = 2.0
    dets, keep = batched_nms(jnp.asarray(p), 0.1, top_k=8)
    assert int(np.asarray(keep).sum()) == 1
    assert float(np.asarray(dets)[0, 0, 4]) == np.float32(0.9)


def test_nms_identical_boxes_different_class_kept():
    p = np.zeros((1, 2, 7), np.float32)
    p[0, :, :4] = [0.1, 0.1, 0.5, 0.5]
    p[0, :, 4] = [0.9, 0.8]
    p[0, :, 5] = 1.0
    p[0, :, 6] = [1.0, 2.0]
    _, keep = batched_nms(jnp.asarray(p), 0.1, top_k=8)
    assert int(np.asarray(keep).sum()) == 2


def test_nms_val_conf_gate():
    p = np.zeros((1, 2, 7), np.float32)
    p[0, 0] = [0.1, 0.1, 0.2, 0.2, 0.05, 1.0, 0]
    p[0, 1] = [0.5, 0.5, 0.7, 0.7, 0.5, 1.0, 1]
    _, keep = batched_nms(jnp.asarray(p), 0.1, top_k=4)
    assert int(np.asarray(keep).sum()) == 1
