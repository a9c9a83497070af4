"""Shape tests against the reference forward trace (SURVEY.md §3.5 /
reference mbv2_yolo.py:137-171)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_yolo_tpu.models import (
    MBv2YOLO,
    MBv3YOLO,
    MBv3YOLOMacc,
    MobileNetV2,
    MobileNetV3Large,
    MobileNetV3Small,
    build_model,
)

RES = 96  # small multiple of 32 keeps CPU compile times sane


def _init_and_run(model, res=RES, train=False):
    x = jnp.zeros((1, res, res, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=train,
                      mutable=["batch_stats"] if train else False)
    return out if not train else out[0]


def test_mobilenetv2_taps():
    c4, c5 = _init_and_run(MobileNetV2())
    assert c4.shape == (1, RES // 16, RES // 16, 96)
    assert c5.shape == (1, RES // 32, RES // 32, 1280)


def test_mobilenetv3_large_taps():
    c4, c5 = _init_and_run(MobileNetV3Large())
    assert c4.shape == (1, RES // 16, RES // 16, 160)
    assert c5.shape == (1, RES // 32, RES // 32, 960)


def test_mobilenetv3_small_taps():
    c4, c5 = _init_and_run(MobileNetV3Small())
    assert c4.shape == (1, RES // 16, RES // 16, 48)
    assert c5.shape == (1, RES // 32, RES // 32, 576)


def test_mbv2_yolo_heads():
    out = _init_and_run(MBv2YOLO(num_classes=20, num_anchors=3))
    assert out["out0"].shape == (1, RES // 32, RES // 32, 75)
    assert out["out1"].shape == (1, RES // 16, RES // 16, 75)
    assert "seg" not in out


def test_mbv2_yolo_seg_branch():
    out = _init_and_run(MBv2YOLO(num_classes=7, num_anchors=3, seg_num_classes=2))
    assert out["out0"].shape == (1, RES // 32, RES // 32, 36)
    assert out["seg"].shape == (1, RES // 16, RES // 16, 2)


def test_mbv3_yolo_heads():
    out = _init_and_run(MBv3YOLO(num_classes=20, num_anchors=3))
    assert out["out0"].shape == (1, RES // 32, RES // 32, 75)
    assert out["out1"].shape == (1, RES // 16, RES // 16, 75)


def test_mbv3_yolo_macc_heads():
    out = _init_and_run(MBv3YOLOMacc(num_classes=20, num_anchors=3))
    assert out["out0"].shape == (1, RES // 32, RES // 32, 75)
    assert out["out1"].shape == (1, RES // 16, RES // 16, 75)


def test_train_mode_updates_batch_stats():
    model = MBv2YOLO(num_classes=2, num_anchors=3)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_build_model_factory():
    cfg = {"yolo": {"num_classes": 20, "num_anchors": 3}}
    assert isinstance(build_model(cfg, "mbv2"), MBv2YOLO)
    assert isinstance(build_model(cfg, "mbv3"), MBv3YOLO)
    assert isinstance(build_model(cfg, "mbv3_macc"), MBv3YOLOMacc)
    with pytest.raises(ValueError):
        build_model(cfg, "nope")


def test_part_add():
    from mobilenet_yolo_tpu.models.layers import part_add
    x = jnp.ones((1, 2, 2, 3))
    y = jnp.full((1, 2, 2, 5), 2.0)
    out = part_add(x, y)
    assert out.shape == (1, 2, 2, 5)
    np.testing.assert_allclose(np.asarray(out[..., :3]), 3.0)
    np.testing.assert_allclose(np.asarray(out[..., 3:]), 2.0)


def test_upsample_nearest2x():
    from mobilenet_yolo_tpu.models.layers import upsample_nearest2x
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    out = np.asarray(upsample_nearest2x(x))[0, ..., 0]
    expect = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])
    np.testing.assert_allclose(out, expect)
