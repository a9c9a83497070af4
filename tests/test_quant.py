"""Post-training int8 quantization tests (CPU).

The reference's KL720 NPU port (reference README.md:54) implies an int8
deployment pipeline; mobilenet_yolo_tpu/quant.py rebuilds it for this
stack. These tests pin:

* per-output-channel weight quantization round-trip error bounds and
  site coverage (every ConvBNAct kernel, never the raw-logit ``out``
  convs);
* calibration covers exactly the quantized sites and is jittable;
* ``QuantSim`` is a no-op when nothing is calibrated, stays close to the
  float model when everything is quantized, and jits through the full
  ``make_predict_fn`` pipeline;
* the int8 .npz artifact reproduces the simulated graph bit-for-bit.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _small_yaml(tmp_path):
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
def setup(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.config import load_config
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.models.bn_fold import fold_batchnorm

    data_yaml = _small_yaml(tmp_path_factory.mktemp("quantcfg"))
    cfg = load_config(data_yaml)
    model = build_model(cfg.model)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.25, size=(2, 96, 96, 3)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    variables = fold_batchnorm(jax.device_get(variables))
    return cfg, model, variables, x, data_yaml


def test_weight_quant_roundtrip(setup):
    from mobilenet_yolo_tpu import quant

    _, _, variables, _, _ = setup
    qkernels, wscales = quant.quantize_weights(variables["params"])
    assert len(qkernels) > 20  # backbone blocks + neck + head stacks
    for site, q in qkernels.items():
        assert q.dtype == np.int8
        s = wscales[site]
        k = np.asarray(_get(variables["params"], site)["conv"]["kernel"],
                       np.float32)
        assert s.shape == (k.shape[-1],)
        # round-to-nearest error bound: |k - q*s| <= s/2 per channel
        err = np.abs(k - q.astype(np.float32) * s)
        assert np.all(err <= s / 2 + 1e-7)
    # the raw-logit output convs are NOT quantized
    assert not any(site.endswith("/out") or "/out/" in site
                   for site in qkernels)
    # ... but they exist in the model
    assert "out" in variables["params"]["yolo_headS32"]


def _get(tree, site):
    node = tree
    for part in site.split("/"):
        node = node[part]
    return node


def test_calibration_covers_quantized_sites(setup):
    from mobilenet_yolo_tpu import quant

    _, model, variables, x, _ = setup
    qkernels, _ = quant.quantize_weights(variables["params"])
    scales = quant.calibrate_activations(model, variables, [x])
    assert set(scales) == set(qkernels)
    assert all(s > 0 for s in scales.values())


def test_quantsim_noop_and_close(setup):
    from mobilenet_yolo_tpu import quant

    _, model, variables, x, _ = setup
    ref = model.apply(variables, x, train=False)

    # empty act table + float weights: bit-identical to the plain model
    noop = quant.QuantSim(model, {}).apply(variables, x, train=False)
    for key in ref:
        assert np.array_equal(np.asarray(ref[key]), np.asarray(noop[key]))

    # full int8 simulation stays close on the raw head outputs
    qkernels, wscales = quant.quantize_weights(variables["params"])
    fq = quant.fake_quant_variables(variables, qkernels, wscales)
    scales = quant.calibrate_activations(model, fq, [x])
    sim = quant.QuantSim(model, scales).apply(fq, x, train=False)
    for key in ref:
        a, b = np.asarray(ref[key]), np.asarray(sim[key])
        assert np.all(np.isfinite(b))
        denom = np.maximum(np.abs(a).mean(), 1e-3)
        assert np.abs(a - b).mean() / denom < 0.35, key


def test_quantsim_through_predict_pipeline(setup):
    import jax.numpy as jnp
    from mobilenet_yolo_tpu import quant
    from mobilenet_yolo_tpu.eval import make_predict_fn

    cfg, model, variables, x, _ = setup
    qkernels, wscales = quant.quantize_weights(variables["params"])
    fq = quant.fake_quant_variables(variables, qkernels, wscales)
    scales = quant.calibrate_activations(model, fq, [x])
    predict = make_predict_fn(quant.QuantSim(model, scales), cfg.model,
                              top_k=32)
    dets, keep = predict(fq, x, jnp.asarray(0.01))
    assert dets.shape == (2, 32, 7)
    assert np.all(np.isfinite(np.asarray(dets)))


def test_int8_artifact_roundtrip(setup, tmp_path):
    from mobilenet_yolo_tpu import quant

    _, model, variables, x, _ = setup
    qkernels, wscales = quant.quantize_weights(variables["params"])
    fq = quant.fake_quant_variables(variables, qkernels, wscales)
    scales = quant.calibrate_activations(model, fq, [x])
    path = str(tmp_path / "model_int8.npz")
    quant.save_int8(path, variables, qkernels, wscales, scales)

    loaded_vars, loaded_scales = quant.load_int8(path)
    assert loaded_scales == scales
    a = quant.QuantSim(model, scales).apply(fq, x, train=False)
    b = quant.QuantSim(model, loaded_scales).apply(
        loaded_vars, x, train=False)
    for key in a:
        assert np.array_equal(np.asarray(a[key]), np.asarray(b[key])), key


def test_quantize_cli_random(setup, tmp_path, capsys):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    try:
        import quantize as quantize_cli
    finally:
        sys.path.pop(0)

    _, _, _, _, data_yaml = setup
    out = str(tmp_path / "cli_int8.npz")
    report = quantize_cli.main([
        "--checkpoint", "none", "--random-weights",
        "--data-yaml", data_yaml, "--out", out,
        "--batch-size", "2", "--calib-batches", "2"])
    assert report["sites"] > 20
    assert 0.5 < report["int8_fraction"] <= 1.0
    from mobilenet_yolo_tpu import quant
    loaded_vars, loaded_scales = quant.load_int8(out)
    assert len(loaded_scales) == report["sites"]
