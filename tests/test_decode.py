"""Decode round-trip and hand-value tests (reference yolo_loss.py:84-92,
180-204)."""

import numpy as np
import jax.numpy as jnp

from mobilenet_yolo_tpu.ops.decode import (
    decode_boxes_train,
    decode_predictions,
    reshape_head,
)


def _logit(p):
    return np.log(p / (1 - p))


def test_decode_hand_value():
    """One anchor, 2x2 grid: cell (1,0) [gj=0,gi=1], tx=ty=0 => sigmoid 0.5,
    tw=th=0 => wh = anchor."""
    H = W = 2
    A, C = 1, 2
    anchors = jnp.asarray([[0.2, 0.4]])
    head = np.zeros((1, H, W, A * (5 + C)), np.float32)
    pred = reshape_head(jnp.asarray(head), A)
    boxes, output = decode_boxes_train(pred, anchors)
    boxes = np.asarray(boxes)
    # cell (gj=0, gi=1): center = (0.5 + 1)/2, (0.5 + 0)/2 = (0.75, 0.25)
    np.testing.assert_allclose(
        boxes[0, 0, 1], [[0.75 - 0.1, 0.25 - 0.2, 0.75 + 0.1, 0.25 + 0.2]],
        rtol=1e-6)
    # logits 0 -> sigmoid 0.5 for conf and both classes
    np.testing.assert_allclose(np.asarray(output)[0, 0, 1], [[0.5, 0.5, 0.5]])


def test_decode_predictions_flat_layout():
    H = W = 2
    A, C = 2, 3
    rng = np.random.default_rng(1)
    head = rng.normal(size=(2, H, W, A * (5 + C))).astype(np.float32)
    anchors = jnp.asarray([[0.2, 0.4], [0.5, 0.5]])
    pred = reshape_head(jnp.asarray(head), A)
    flat = np.asarray(decode_predictions(pred, anchors))
    assert flat.shape == (2, H * W * A, 7)

    # spot-check element (b=1, gj=1, gi=0, a=1)
    b, gj, gi, a = 1, 1, 0, 1
    raw = head[b, gj, gi, a * (5 + C):(a + 1) * (5 + C)]
    sig = 1 / (1 + np.exp(-raw))
    cx = (sig[0] + gi) / W
    cy = (sig[1] + gj) / H
    w = np.exp(raw[2]) * 0.5
    h = np.exp(raw[3]) * 0.5
    idx = (gj * W + gi) * A + a
    got = flat[b, idx]
    np.testing.assert_allclose(
        got[:4], [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], rtol=1e-5)
    np.testing.assert_allclose(got[4], sig[4], rtol=1e-5)
    cls_probs = sig[5:]
    np.testing.assert_allclose(got[5], cls_probs.max(), rtol=1e-5)
    assert int(got[6]) == int(cls_probs.argmax())


def test_train_eval_decode_agree():
    """Train and eval decodes must produce identical box values."""
    rng = np.random.default_rng(2)
    A, C, H, W = 3, 4, 3, 3
    head = rng.normal(size=(1, H, W, A * (5 + C))).astype(np.float32)
    anchors = jnp.asarray(rng.uniform(0.1, 0.6, (A, 2)).astype(np.float32))
    pred = reshape_head(jnp.asarray(head), A)
    boxes_train, _ = decode_boxes_train(pred, anchors)
    flat = np.asarray(decode_predictions(pred, anchors))
    np.testing.assert_allclose(
        np.asarray(boxes_train).reshape(1, -1, 4), flat[..., :4], rtol=1e-5)
