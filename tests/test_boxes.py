import numpy as np
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops import boxes as B


def test_cxcywh_corners_roundtrip(rng):
    b = rng.uniform(0.1, 0.9, size=(17, 4)).astype(np.float32)
    out = B.corners_to_cxcywh(B.cxcywh_to_corners(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-6, atol=1e-6)


def test_pairwise_iou_hand_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([
        [0.0, 0.0, 2.0, 2.0],   # identical -> 1
        [1.0, 1.0, 3.0, 3.0],   # overlap 1, union 7 -> 1/7
        [2.0, 2.0, 4.0, 4.0],   # touching -> 0
        [5.0, 5.0, 6.0, 6.0],   # disjoint -> 0
    ])
    iou = np.asarray(B.pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 1.0 / 7.0, 0.0, 0.0], atol=1e-6)


def test_elementwise_iou_matches_pairwise(rng):
    a = rng.uniform(0, 1, size=(9, 4)).astype(np.float32)
    b = rng.uniform(0, 1, size=(9, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    el = np.asarray(B.elementwise_iou(jnp.asarray(a), jnp.asarray(b)))
    pw = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(el, np.diag(pw), rtol=1e-6)


def test_shape_iou():
    wh1 = jnp.asarray([[0.2, 0.4]])
    wh2 = jnp.asarray([[0.2, 0.4], [0.1, 0.2], [0.4, 0.4]])
    got = np.asarray(B.shape_iou(wh1, wh2))[0]
    # inter = min(w)*min(h); union = w1h1 + w2h2 - inter
    expect = [
        1.0,
        (0.1 * 0.2) / (0.08 + 0.02 - 0.02),
        (0.2 * 0.4) / (0.08 + 0.16 - 0.08),
    ]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_ciou_identical_boxes_is_iou():
    b1 = jnp.asarray([[0.1, 0.1, 0.5, 0.6]])
    ciou, iou = B.box_ciou(b1, b1)
    np.testing.assert_allclose(np.asarray(iou), [1.0], atol=1e-6)
    # identical boxes: d = 0, ar_loss = 0 -> ciou == iou
    np.testing.assert_allclose(np.asarray(ciou), [1.0], atol=1e-6)


def test_ciou_hand_value():
    # gt (0,0,2,2), pred (1,1,3,3): iou = 1/7, enclosing (0,0,3,3) area 9,
    # center dist^2 = 2, same aspect ratio -> ar_loss = 0 -> ciou = iou - 2/9
    gt = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    pr = jnp.asarray([[1.0, 1.0, 3.0, 3.0]])
    ciou, iou = B.box_ciou(gt, pr)
    np.testing.assert_allclose(np.asarray(iou), [1.0 / 7.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ciou), [1.0 / 7.0 - 2.0 / 9.0], rtol=1e-5)


def test_ciou_aspect_ratio_penalty_sign():
    # very different aspect ratios must reduce ciou below plain diou
    gt = jnp.asarray([[0.0, 0.0, 4.0, 1.0]])
    pr = jnp.asarray([[0.0, 0.0, 1.0, 4.0]])
    ciou, iou = B.box_ciou(gt, pr)
    assert float(ciou[0]) < float(iou[0])


def test_giou_disjoint_negative():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[2.0, 2.0, 3.0, 3.0]])
    giou, iou = B.box_giou(a, b)
    assert float(iou[0]) == 0.0
    assert float(giou[0]) < 0.0
