"""Parity tests: the vectorized target assignment against a naive per-GT
loop oracle implementing the reference semantics (yolo_loss.py:77-178)
directly in numpy."""

import math

import numpy as np
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.assign import build_targets
from mobilenet_yolo_tpu.ops.decode import decode_boxes_train, reshape_head

EPS = 0.1
Y_TRUE = (1 - EPS) + 0.5 * EPS
Y_FALSE = 0.5 * EPS


def _iou_np(a, b):
    lower = np.maximum(a[:, None, :2], b[None, :, :2])
    upper = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(upper - lower, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _ciou_np(gt, pr):
    """Scalar CIoU between two corner boxes, straight from the formula."""
    iou = _iou_np(gt[None], pr[None])[0, 0]
    cl = min(gt[0], pr[0]); ct = min(gt[1], pr[1])
    cr = max(gt[2], pr[2]); cb = max(gt[3], pr[3])
    c = (cr - cl) * (cb - ct)
    if c == 0:
        return iou - iou, iou
    w1, h1 = gt[2] - gt[0], gt[3] - gt[1]
    w2, h2 = pr[2] - pr[0], pr[3] - pr[1]
    x1, y1 = (gt[0] + gt[2]) / 2, (gt[1] + gt[3]) / 2
    x2, y2 = (pr[0] + pr[2]) / 2, (pr[1] + pr[3]) / 2
    d = ((x1 - x2) ** 2 + (y1 - y2) ** 2) / c
    ar_loss = 4 / math.pi ** 2 * (math.atan(w2 / h2) - math.atan(w1 / h1)) ** 2
    alpha = ar_loss / (1 - iou + ar_loss + 1e-6)
    return iou - (d + alpha * ar_loss), iou


def oracle_assign(pred_boxes, output, gt_list, anchors_all, mask,
                  ignore_thresh, iou_thresh):
    """Reference get_target as a literal python loop (the oracle)."""
    B, H, W, A, _ = pred_boxes.shape
    C = output.shape[-1] - 1
    targets = output.copy()
    weights = np.zeros_like(output)
    cious, areas, ious_el = [], [], []
    count = 0
    obj = 0.0
    recall = 0
    iou_sum = 0.0
    cls_sum = 0.0
    no_obj_total = output[..., 0].sum()

    for b in range(B):
        gts = gt_list[b]
        if len(gts) == 0:
            weights[b, ..., 0] = 1
            targets[b, ..., 0] = 0
            continue
        gts = np.asarray(gts, np.float32)
        cx, cy, w, h = gts[:, 1], gts[:, 2], gts[:, 3], gts[:, 4]
        gt_corners = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        flat = pred_boxes[b].reshape(-1, 4)
        max_iou = _iou_np(gt_corners, flat).max(0).reshape(H, W, A)
        neg = max_iou < ignore_thresh
        weights[b, ..., 0][neg] = 1
        targets[b, ..., 0][neg] = 0

        # anchor-shape IoU: origin-pinned corner boxes (0,0,w,h)
        shapes_gt = np.stack([np.zeros_like(w), np.zeros_like(h), w, h], -1)
        shapes_anchor = np.concatenate(
            [np.zeros_like(anchors_all), anchors_all], -1)
        anch_iou = _iou_np(shapes_gt, shapes_anchor)
        best_n = anch_iou.argmax(1)

        for t in range(len(gts)):
            gi = int(cx[t] * W)
            gj = int(cy[t] * H)
            bn = mask.index(best_n[t]) if best_n[t] in mask else -99
            for k in range(len(mask)):
                if k == bn or anch_iou[t, mask[k]] > iou_thresh:
                    count += 1
                    ciou, iou = _ciou_np(gt_corners[t], pred_boxes[b, gj, gi, k])
                    cious.append(ciou)
                    areas.append(2.0 - w[t] * h[t])
                    ious_el.append(iou)
                    targets[b, gj, gi, k, 0] = 1
                    weights[b, gj, gi, k, 0] = 1
                    obj += output[b, gj, gi, k, 0]
                    if iou > ignore_thresh:
                        recall += 1
                    iou_sum += iou
                    cls = int(gts[t, 0]) - 1
                    if weights[b, gj, gi, k, 1 + cls] > 0:
                        targets[b, gj, gi, k, 1 + cls] = Y_TRUE
                        weights[b, gj, gi, k, 1 + cls] = 1
                    else:
                        targets[b, gj, gi, k, 1:] = Y_FALSE
                        weights[b, gj, gi, k, 1:] = 1
                        targets[b, gj, gi, k, 1 + cls] = Y_TRUE
                    cls_sum += output[b, gj, gi, k, 1 + cls]

    no_cnt = B * H * W * A
    if count:
        metrics = dict(
            recall=recall / count, avg_iou=iou_sum / count, obj=obj / count,
            no_obj=(no_obj_total - obj) / (no_cnt - count),
            cls_score=cls_sum / count, count=count / B,
        )
    else:
        metrics = dict(recall=0.0, avg_iou=0.0, obj=0.0, no_obj=0.0,
                       cls_score=0.0, count=0.0)
    return targets, weights, cious, areas, count, metrics


def _random_scene(rng, B=3, H=6, W=6, A=3, C=5, max_gt=7):
    head = rng.normal(0, 1.2, size=(B, H, W, A * (5 + C))).astype(np.float32)
    anchors_all = np.array(
        [[0.40, 0.75], [0.43, 0.34], [0.80, 0.79],
         [0.06, 0.11], [0.14, 0.27], [0.21, 0.57]], np.float32)
    mask = [0, 1, 2] if rng.random() < 0.5 else [3, 4, 5]
    gt_list = []
    for b in range(B):
        n = int(rng.integers(0, max_gt))
        rows = []
        for _ in range(n):
            cls = int(rng.integers(1, C + 1))
            w = float(rng.uniform(0.05, 0.6))
            h = float(rng.uniform(0.05, 0.6))
            cx = float(rng.uniform(w / 2, 1 - w / 2))
            cy = float(rng.uniform(h / 2, 1 - h / 2))
            rows.append([cls, cx, cy, w, h])
        gt_list.append(rows)
    return head, anchors_all, mask, gt_list


def _pad_gt(gt_list, T):
    B = len(gt_list)
    gt = np.zeros((B, T, 5), np.float32)
    n_gt = np.zeros((B,), np.int32)
    for b, rows in enumerate(gt_list):
        n_gt[b] = len(rows)
        for t, r in enumerate(rows):
            gt[b, t] = r
    return gt, n_gt


def test_assign_matches_oracle(rng):
    for seed in range(4):
        r = np.random.default_rng(seed)
        head, anchors_all, mask, gt_list = _random_scene(r)
        B, H, W, AC = head.shape
        A, C = 3, 5
        ignore_thresh, iou_thresh = 0.55, 0.5

        pred = reshape_head(jnp.asarray(head), A)
        anchors_head = jnp.asarray(anchors_all)[jnp.asarray(mask)]
        pred_boxes, output = decode_boxes_train(pred, anchors_head)
        pred_boxes_np = np.asarray(pred_boxes)
        output_np = np.asarray(output)

        gt, n_gt = _pad_gt(gt_list, T=8)
        res = build_targets(
            pred_boxes, output, jnp.asarray(gt), jnp.asarray(n_gt),
            jnp.asarray(anchors_all), mask, ignore_thresh, iou_thresh,
        )

        o_targets, o_weights, o_cious, o_areas, o_count, o_metrics = oracle_assign(
            pred_boxes_np, output_np, gt_list, anchors_all, mask,
            ignore_thresh, iou_thresh,
        )

        np.testing.assert_allclose(np.asarray(res.weights), o_weights, atol=1e-6)
        w_mask = o_weights > 0
        np.testing.assert_allclose(
            np.asarray(res.targets)[w_mask], o_targets[w_mask], atol=1e-6)

        assert int(res.count) == o_count
        got_cious = np.sort(np.asarray(res.ciou)[np.asarray(res.assign)])
        np.testing.assert_allclose(got_cious, np.sort(o_cious), atol=1e-4)
        got_areas = np.sort(
            np.asarray(res.area_weight)[np.asarray(res.assign)])
        np.testing.assert_allclose(got_areas, np.sort(o_areas), atol=1e-5)

        for k, v in o_metrics.items():
            np.testing.assert_allclose(
                float(res.metrics[k]), v, atol=1e-4, err_msg=f"metric {k} seed {seed}")


def test_assign_empty_image():
    """Image with no GT: every conf weight 1, target 0, no positives."""
    A, C, H, W = 3, 4, 4, 4
    head = np.zeros((1, H, W, A * (5 + C)), np.float32)
    anchors_all = np.full((6, 2), 0.3, np.float32)
    pred = reshape_head(jnp.asarray(head), A)
    pred_boxes, output = decode_boxes_train(pred, jnp.asarray(anchors_all[:3]))
    gt = np.zeros((1, 5, 5), np.float32)
    res = build_targets(pred_boxes, output, jnp.asarray(gt),
                        jnp.asarray([0]), jnp.asarray(anchors_all), [0, 1, 2],
                        0.5, 0.5)
    w = np.asarray(res.weights)
    t = np.asarray(res.targets)
    assert (w[..., 0] == 1).all()
    assert (t[..., 0] == 0).all()
    assert (w[..., 1:] == 0).all()
    assert int(res.count) == 0
    assert float(res.metrics["recall"]) == 0.0
