"""tools/export.py serving-export tests (CPU).

The reference's deployment story is a commented-out ONNX export
(train.py:429-433); ours is jax.export. These tests prove the exported
artifacts are actually loadable and numerically identical to the live
predict path:

* ``aot`` — serialized bytes deserialize via jax.export and reproduce the
  live detections exactly;
* ``stablehlo`` — the portable IR text contains a well-formed module;
* ``npz`` — round-trips through cli.infer.load_variables;
* ``--fold-bn`` — folded export stays numerically equivalent.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")

YAML = "mobilenet_yolo_tpu/configs/voc_data.yaml"


def _write_small_yaml(tmp_path):
    """A small-resolution model yaml so export tests compile quickly."""
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(
        "img_w: 96\nimg_h: 96\nclasses: 4\niou_weighting: 0.02\n"
        "train_img_size: [[96, 96]]\nbatch_size: 2\n"
        "yolo:\n  num_classes: 4\n  num_anchors: 3\n"
        "  ignore_thresh: [0.6, 0.55]\n  iou_thresh: 0.55\n"
        "  anchors: [[20, 24], [30, 30], [44, 40], [6, 8], [10, 14], "
        "[14, 10]]\n"
        "  mask: [[0, 1, 2], [3, 4, 5]]\n")
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(
        "train_root: .\ntest_root: .\n"
        f"model_config_path: {model_yaml}\n"
        "classes:\n  map: [bg, a, b, c]\n")
    return str(data_yaml)


@pytest.fixture(scope="module")
def small_yaml(tmp_path_factory):
    return _write_small_yaml(tmp_path_factory.mktemp("exportcfg"))


def _predict_live(data_yaml, x, val_conf, fold_bn=False):
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import build_model

    cfg = load_config(data_yaml)
    model = build_model(cfg.model)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False))()
    if fold_bn:
        from mobilenet_yolo_tpu.models.bn_fold import fold_batchnorm
        variables = fold_batchnorm(variables)
    predict = make_predict_fn(model, cfg.model)
    return predict(variables, jnp.asarray(x), jnp.float32(val_conf))


def test_export_aot_roundtrip(tmp_path, small_yaml, rng):
    """Serialized AOT artifact -> deserialize -> call == live predict."""
    import jax
    import jax.numpy as jnp
    from tools.export import main

    out = str(tmp_path / "model.jaxexport")
    main(["--checkpoint", "nonexistent", "--random-weights",
          "--data-yaml", small_yaml, "--what", "aot", "--out", out,
          "--batch-size", "2"])
    assert os.path.getsize(out) > 1000

    x = rng.normal(0, 0.8, (2, 96, 96, 3)).astype(np.float32)
    with open(out, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    dets_x, keep_x = exported.call(jnp.asarray(x), jnp.float32(0.05))

    dets, keep = _predict_live(small_yaml, x, 0.05)
    np.testing.assert_array_equal(np.asarray(keep_x), np.asarray(keep))
    np.testing.assert_allclose(np.asarray(dets_x), np.asarray(dets),
                               rtol=1e-6, atol=1e-6)


def test_export_stablehlo_text(tmp_path, small_yaml):
    from tools.export import main

    out = str(tmp_path / "model.stablehlo")
    main(["--checkpoint", "nonexistent", "--random-weights",
          "--data-yaml", small_yaml, "--what", "stablehlo", "--out", out])
    text = open(out).read()
    assert "module" in text and "stablehlo" in text
    # the whole pipeline is in there: convs (forward) + sort (NMS top-k)
    assert "convolution" in text
    assert "sort" in text or "top_k" in text


def test_export_npz_roundtrip(tmp_path, small_yaml, rng):
    """npz export loads through cli.infer.load_variables and reproduces
    the live detections."""
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.cli.infer import load_variables
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.models import build_model
    from tools.export import main

    out = str(tmp_path / "params.npz")
    main(["--checkpoint", "nonexistent", "--random-weights",
          "--data-yaml", small_yaml, "--what", "npz", "--out", out])

    x = rng.normal(0, 0.8, (2, 96, 96, 3)).astype(np.float32)
    cfg = load_config(small_yaml)
    model = build_model(cfg.model)
    variables = load_variables(model, out, jnp.asarray(x))
    predict = make_predict_fn(model, cfg.model)
    dets_n, keep_n = predict(variables, jnp.asarray(x), jnp.float32(0.05))
    dets, keep = _predict_live(small_yaml, x, 0.05)
    np.testing.assert_array_equal(np.asarray(keep_n), np.asarray(keep))
    np.testing.assert_allclose(np.asarray(dets_n), np.asarray(dets),
                               rtol=1e-6, atol=1e-6)


def test_export_fold_bn_equivalent(tmp_path, small_yaml, rng):
    """--fold-bn export == unfolded live predict (inference BN is affine,
    folding is exact up to float assoc; detections must survive NMS
    identically at a safe margin from decision boundaries)."""
    import jax
    import jax.numpy as jnp
    from tools.export import main

    out = str(tmp_path / "folded.jaxexport")
    main(["--checkpoint", "nonexistent", "--random-weights",
          "--data-yaml", small_yaml, "--what", "aot", "--out", out,
          "--batch-size", "2", "--fold-bn"])
    x = rng.normal(0, 0.8, (2, 96, 96, 3)).astype(np.float32)
    with open(out, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    dets_f, keep_f = exported.call(jnp.asarray(x), jnp.float32(0.05))
    dets, keep = _predict_live(small_yaml, x, 0.05)
    assert np.asarray(keep_f).sum() == np.asarray(keep).sum()
    np.testing.assert_allclose(
        np.asarray(dets_f)[np.asarray(keep_f)],
        np.asarray(dets)[np.asarray(keep)], rtol=1e-3, atol=1e-4)
