import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.losses import seg_loss, weighted_mse_loss, yolo_head_loss
from mobilenet_yolo_tpu.ops.sigmoid_st import sigmoid_st

ANCHORS = np.array(
    [[0.40, 0.75], [0.43, 0.34], [0.80, 0.79],
     [0.06, 0.11], [0.14, 0.27], [0.21, 0.57]], np.float32)


def test_weighted_mse_hand_value():
    x = jnp.asarray([1.0, 2.0, 3.0])
    t = jnp.asarray([0.0, 0.0, 0.0])
    w = jnp.asarray([1.0, 0.0, 2.0])
    # sum(x^2 * w)/sum(w) = (1 + 0 + 18)/3
    got = float(weighted_mse_loss(x, t, w))
    np.testing.assert_allclose(got, 19.0 / 3.0, rtol=1e-6)


def test_sigmoid_st_identity_backward():
    x = jnp.asarray([0.3, -1.2, 4.0])
    g = jax.grad(lambda v: jnp.sum(sigmoid_st(v) * jnp.asarray([1.0, 2.0, 3.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0], rtol=1e-6)


def test_conf_gradient_is_bce_shaped(rng):
    """With the straight-through sigmoid, d(conf loss)/d(logit) must be
    2*w/sum(w) * (sigmoid(x) - target): the BCE-with-logits gradient shape."""
    A, C, H, W = 3, 4, 4, 4
    head = rng.normal(0, 1, size=(1, H, W, A * (5 + C))).astype(np.float32)
    gt = np.zeros((1, 4, 5), np.float32)
    gt[0, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    n_gt = np.asarray([1], np.int32)

    def loss_fn(h):
        out = yolo_head_loss(h, jnp.asarray(gt), jnp.asarray(n_gt),
                             jnp.asarray(ANCHORS), [0, 1, 2], C,
                             ignore_thresh=0.99,  # everything negative/positive
                             iou_thresh=0.99, iou_weighting=0.0)
        return out.loss

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(head)))
    g = g.reshape(1, H, W, A, 5 + C)

    # recompute expected conf gradient by hand
    pred = head.reshape(1, H, W, A, 5 + C)
    sig = 1 / (1 + np.exp(-pred[..., 4]))
    # weights: conf weight 1 everywhere except ignored cells; with
    # ignore_thresh=0.99 every cell is negative unless positive
    from mobilenet_yolo_tpu.ops.decode import decode_boxes_train, reshape_head
    from mobilenet_yolo_tpu.ops.assign import build_targets
    pb, out = decode_boxes_train(reshape_head(jnp.asarray(head), A),
                                 jnp.asarray(ANCHORS[:3]))
    res = build_targets(pb, out, jnp.asarray(gt), jnp.asarray(n_gt),
                        jnp.asarray(ANCHORS), [0, 1, 2], 0.99, 0.99)
    wts = np.asarray(res.weights)
    tgts = np.asarray(res.targets)
    total_w = wts.sum()
    expected_conf_grad = 2 * (sig - tgts[..., 0]) * wts[..., 0] / total_w
    np.testing.assert_allclose(g[..., 4], expected_conf_grad, rtol=1e-4, atol=1e-6)


def test_head_loss_zero_when_perfect():
    """If sigmoid outputs exactly match targets and boxes are perfect, the
    conf/cls part of the loss vanishes (iou part tested separately)."""
    A, C, H, W = 3, 2, 2, 2
    head = np.full((1, H, W, A * (5 + C)), -20.0, np.float32)  # sigmoid ~ 0
    gt = np.zeros((1, 1, 5), np.float32)
    out = yolo_head_loss(jnp.asarray(head), jnp.asarray(gt),
                         jnp.asarray([0], np.int32), jnp.asarray(ANCHORS),
                         [0, 1, 2], C, 0.5, 0.5, 0.02)
    assert float(out.loss) < 1e-8


def test_seg_loss():
    logits = np.full((2, 4, 4, 2), -20.0, np.float32)
    truth = np.zeros((2, 4, 4, 2), np.float32)
    loss, obj, no_obj = seg_loss(jnp.asarray(logits), jnp.asarray(truth))
    assert float(loss) < 1e-8
    assert float(no_obj) < 1e-6

    truth[0, 0, 0, 0] = 1.0
    loss2, obj2, _ = seg_loss(jnp.asarray(logits), jnp.asarray(truth))
    # one wrong pixel: 0.05 * 1/numel
    np.testing.assert_allclose(float(loss2), 0.05 / truth.size, rtol=1e-4)
    assert float(obj2) < 1e-6  # predicted ~0 at the object pixel


def test_seg_loss_gradient_identity_backward():
    logits = jnp.zeros((1, 2, 2, 1))
    truth = jnp.ones((1, 2, 2, 1))
    g = jax.grad(lambda x: seg_loss(x, truth)[0])(logits)
    # d/dx 0.05*mean((sig_st(x)-t)^2) with identity backward:
    # 0.05 * 2*(0.5-1)/4 = -0.0125
    np.testing.assert_allclose(np.asarray(g), np.full((1, 2, 2, 1), -0.0125),
                               rtol=1e-5)
