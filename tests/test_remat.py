"""Remat (activation rematerialization) equivalence tests.

``build_model(cfg)`` with ``cfg["remat"] = True`` wraps every backbone
block in ``flax.linen.remat`` (jax.checkpoint): the 6x-expanded hidden
activations are recomputed in the backward instead of stored. This is a
pure scheduling change — the param tree and forward outputs must be
bit-identical to the plain model; gradients must agree up to backward
reduction-order rounding (XLA fuses the recomputed backward differently,
so f32 sums reassociate — bit-equality is NOT the contract there).
Backward memory/time trade measured in PERF.md "Training throughput"
(knob experiments, 2026-08-20): remat costs ~12-14% step time at batch
32-128 and does NOT raise this model's batch ceiling (both plain and
remat OOM at batch 256 bf16/352² — the stored block-boundary
activations dominate, not the rematerialized 6x hiddens), so it ships
opt-in rather than default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_yolo_tpu.models import build_model

RES = 96


def _cfg(num_classes=3, seg=0):
    cfg = {"yolo": {"num_classes": num_classes, "num_anchors": 3}}
    if seg:
        cfg["seg"] = {"num_classes": seg}
    return cfg


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (_, x), (_, y) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("backbone", ["mbv2", "mbv3", "mbv3_macc"])
def test_remat_param_tree_and_forward_identical(backbone):
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, RES, RES, 3)),
                    jnp.float32)
    plain = build_model(_cfg(), backbone=backbone)
    remat = build_model({**_cfg(), "remat": True}, backbone=backbone)
    v_p = plain.init(jax.random.PRNGKey(0), x, train=False)
    v_r = remat.init(jax.random.PRNGKey(0), x, train=False)
    _tree_equal(v_p, v_r)  # same names, shapes, values -> checkpoint-compatible

    out_p = plain.apply(v_p, x, train=False)
    out_r = remat.apply(v_r, x, train=False)
    _tree_equal(out_p, out_r)


def test_remat_gradients_identical():
    """Plain vs remat gradients in float64.

    In f32 the comparison is cancellation-dominated: deep-layer bias
    grads sum ~1e4 near-cancelling contributions, so reassociating the
    recomputed backward moves small leaves by >100% of their own scale
    while being bitwise-benign. f64 shrinks the rounding term ~1e9x, so
    any real semantic difference in the remat path would stand out.
    """
    from contextlib import contextmanager

    from mobilenet_yolo_tpu.models import MobileNetV2

    @contextmanager
    def enable_x64():
        # jax.experimental.enable_x64 is gone in this jax; flip the config
        # flag and restore it so the rest of the suite stays x32
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, RES, RES, 3)),
                        jnp.float64)
        plain = MobileNetV2(width_mult=0.35)
        remat = MobileNetV2(width_mult=0.35, remat=True)
        variables = plain.init(jax.random.PRNGKey(0), x, train=False)
        params = jax.tree.map(lambda a: a.astype(jnp.float64),
                              variables["params"])
        batch_stats = jax.tree.map(lambda a: a.astype(jnp.float64),
                                   variables["batch_stats"])

        def loss(model, p):
            (c4, c5), _ = model.apply({"params": p, "batch_stats": batch_stats},
                                      x, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(c4)) + jnp.sum(jnp.square(c5))

        g_p = jax.jit(jax.grad(lambda p: loss(plain, p)))(params)
        g_r = jax.jit(jax.grad(lambda p: loss(remat, p)))(params)
        la = jax.tree_util.tree_leaves_with_path(g_p)
        lb = jax.tree_util.tree_leaves_with_path(g_r)
        assert [p for p, _ in la] == [p for p, _ in lb]
        for (path, gp), (_, gr) in zip(la, lb):
            gp, gr = np.asarray(gp), np.asarray(gr)
            err = np.abs(gp - gr).max() / (np.abs(gp).max() + 1e-12)
            assert err < 1e-7, (jax.tree_util.keystr(path), err)


def test_train_step_donate_flag_matches():
    """donate=False must produce the same step as the donating default."""
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import make_train_step

    from mobilenet_yolo_tpu.models import MBv2YOLO

    cfg = {
        "img_w": RES, "img_h": RES, "iou_weighting": 0.02,
        "yolo": {
            "num_classes": 4, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[34, 47], [48, 40], [70, 70],
                        [10, 12], [15, 25], [24, 18]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.normal(0, 1, (2, RES, RES, 3)), jnp.float32)
    gt = np.zeros((2, 30, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    gt = jnp.asarray(gt)
    n_gt = jnp.ones((2,), jnp.int32)

    outs = []
    for donate in (True, False):
        state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                       (RES, RES))
        step = make_train_step(model, cfg, tx, donate=donate)
        state, metrics = step(state, images, gt, n_gt)
        outs.append((jax.device_get(state.params), jax.device_get(metrics)))
    _tree_equal(outs[0][0], outs[1][0])
    _tree_equal(outs[0][1], outs[1][1])
