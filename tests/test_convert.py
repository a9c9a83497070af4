"""Torch-checkpoint converter structural tests: the mapping must cover the
flax tree exactly (same paths, same shapes after OIHW->HWIO)."""

import numpy as np
import jax
import pytest

from tools.convert_torch import (
    convert,
    mbv2_backbone_mapping,
    mbv2_yolo_mapping,
    mbv3_yolo_mapping,
)


def _flax_tree(model, res=64):
    import jax.numpy as jnp
    x = jnp.zeros((1, res, res, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, train=False)


def _paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def _fake_torch_sd(mapping, flax_shapes):
    """Synthesize a torch state_dict with reference names and shapes."""
    sd = {}
    for (col, *path), torch_key in mapping.items():
        shape = flax_shapes[tuple(path)]
        if path[-1] == "kernel" and len(shape) == 4:
            shape = (shape[3], shape[2], shape[0], shape[1])  # HWIO->OIHW
        sd[torch_key] = np.random.default_rng(0).normal(size=shape).astype(np.float32)
    return sd


@pytest.mark.parametrize("seg", [False, True])
def test_mbv2_yolo_mapping_covers_tree(seg):
    from mobilenet_yolo_tpu.models import MBv2YOLO
    model = MBv2YOLO(num_classes=20, num_anchors=3,
                     seg_num_classes=2 if seg else 0)
    variables = _flax_tree(model)
    mapping = mbv2_yolo_mapping(segmentation=seg)

    flax_shapes = {}
    flax_shapes.update(_paths(variables["params"]))
    stats_shapes = _paths(variables["batch_stats"])

    mapped_params = {tuple(p[1:]) for p in mapping if p[0] == "params"}
    mapped_stats = {tuple(p[1:]) for p in mapping if p[0] == "batch_stats"}
    assert mapped_params == set(flax_shapes.keys()), (
        "param coverage mismatch: missing "
        f"{set(flax_shapes) - mapped_params}, extra "
        f"{mapped_params - set(flax_shapes)}")
    assert mapped_stats == set(stats_shapes.keys())


def test_convert_roundtrip_runs_forward():
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.models import MBv2YOLO
    model = MBv2YOLO(num_classes=20, num_anchors=3)
    variables = _flax_tree(model)
    mapping = mbv2_yolo_mapping()

    shapes = _paths(variables["params"])
    shapes.update(_paths(variables["batch_stats"]))
    sd = _fake_torch_sd(mapping, shapes)
    params, batch_stats = convert(sd, mapping)

    # structural equality with the flax-initialized tree
    assert _paths(params).keys() == _paths(variables["params"]).keys()
    for path, shape in _paths(params).items():
        assert shape == _paths(variables["params"])[path], path

    out = model.apply({"params": jax.tree.map(jnp.asarray, params),
                       "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["out0"].shape == (1, 2, 2, 75)


def test_kernel_transposed():
    mapping = {("params", "stem", "conv", "kernel"): "features.0.0.weight"}
    w = np.arange(2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3)  # OIHW
    params, _ = convert({"features.0.0.weight": w}, mapping)
    got = params["stem"]["conv"]["kernel"]
    assert got.shape == (3, 3, 3, 2)  # HWIO
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0))


def test_mbv3_yolo_mapping_covers_tree():
    from mobilenet_yolo_tpu.models import MBv3YOLO
    model = MBv3YOLO(num_classes=20, num_anchors=3)
    variables = _flax_tree(model)
    mapping = mbv3_yolo_mapping()
    flax_params = set(_paths(variables["params"]).keys())
    flax_stats = set(_paths(variables["batch_stats"]).keys())
    mapped_params = {tuple(p[1:]) for p in mapping if p[0] == "params"}
    mapped_stats = {tuple(p[1:]) for p in mapping if p[0] == "batch_stats"}
    assert mapped_params == flax_params, (
        f"missing {flax_params - mapped_params}, extra "
        f"{mapped_params - flax_params}")
    assert mapped_stats == flax_stats


def test_mbv3_mapping_key_names():
    m = mbv3_yolo_mapping()
    keys = set(m.values())
    assert "backbone.conv1.weight" in keys                    # stem
    assert "backbone.bneck.3.se.se.0.weight" in keys          # first SE block
    assert "backbone.bneck.10.shortcut.0.weight" in keys      # stride-1 ch change
    assert "backbone.bneck2.0.conv2.weight" in keys           # stage-2 dw
    assert "backbone.conv2.weight" in keys                    # 960 head conv
    assert "yolo_headS16.3.bias" in keys


def test_backbone_mapping_key_names():
    """Spot-check the reference key naming (mobilenetv2.py graph)."""
    m = mbv2_backbone_mapping("backbone.")
    keys = set(m.values())
    assert "backbone.features.0.0.weight" in keys            # stem conv
    assert "backbone.features.1.conv.0.weight" in keys       # block0 dw
    assert "backbone.features.13.conv.6.weight" in keys      # block12 project
    assert "backbone.features2.0.conv.0.weight" in keys      # block13 expand
    assert "backbone.conv.0.weight" in keys                  # head 1x1
    assert "backbone.features.0.1.running_mean" in keys      # stem bn stats


def test_load_torch_state_dict_canonicalizes_keys(tmp_path):
    """Both checkpoint key forms must canonicalize to the module naming
    (features2.N) that the mappings use: detector checkpoints already carry
    it; bare ImageNet backbones use a continuous features.{0..17}."""
    torch = pytest.importorskip("torch")
    from tools.convert_torch import load_torch_state_dict

    # ImageNet-style: continuous features indices (+ module. prefix)
    sd = {"module.features.14.conv.0.weight": torch.zeros(2, 2, 1, 1),
          "features.13.conv.0.weight": torch.zeros(2, 2, 1, 1),
          "conv.0.weight": torch.zeros(2, 2, 1, 1)}
    path = str(tmp_path / "imagenet.pth")
    torch.save(sd, path)
    out = load_torch_state_dict(path)
    assert "features2.0.conv.0.weight" in out      # 14 -> features2.0
    assert "features.13.conv.0.weight" in out      # stage-1 untouched
    assert "conv.0.weight" in out

    # detector-style: features2 keys pass through unchanged
    sd2 = {"backbone.features2.3.conv.0.weight": torch.zeros(1),
           "yolo_headS32.3.bias": torch.zeros(1)}
    path2 = str(tmp_path / "detector.pth.tar")
    torch.save({"model": sd2}, path2)
    out2 = load_torch_state_dict(path2)
    assert "backbone.features2.3.conv.0.weight" in out2
    assert "yolo_headS32.3.bias" in out2


@pytest.mark.parametrize("what", ["full", "full_seg", "mbv3"])
def test_export_state_dict_inverts_convert(what):
    """JAX -> torch export is the exact inverse of the import: exporting a
    flax-initialized tree and converting it back reproduces every leaf
    bit-for-bit (and the torch keys/shapes match the reference naming)."""
    from mobilenet_yolo_tpu.models import MBv2YOLO, MBv3YOLO
    from tools.convert_torch import export_state_dict

    if what == "mbv3":
        model = MBv3YOLO(num_classes=20, num_anchors=3)
        mapping = mbv3_yolo_mapping()
    else:
        model = MBv2YOLO(num_classes=20, num_anchors=3,
                         seg_num_classes=2 if what == "full_seg" else 0)
        mapping = mbv2_yolo_mapping(segmentation=(what == "full_seg"))
    variables = _flax_tree(model)

    sd = export_state_dict(variables["params"], variables["batch_stats"],
                           mapping)
    assert set(sd.keys()) == set(mapping.values())
    back_params, back_stats = convert(sd, mapping)
    for tree, back in ((variables["params"], back_params),
                       (variables["batch_stats"], back_stats)):
        want, got = _paths(tree), _paths(back)
        assert want.keys() == got.keys()
    import jax

    def assert_equal(a, b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    jax.tree.map(assert_equal, dict(variables["params"]), back_params)
    jax.tree.map(assert_equal, dict(variables["batch_stats"]), back_stats)


def test_export_state_dict_missing_path_raises():
    from tools.convert_torch import export_state_dict
    mapping = {("params", "stem", "conv", "kernel"): "features.0.0.weight"}
    with pytest.raises(KeyError):
        export_state_dict({}, {}, mapping)


def test_reverse_cli_writes_reference_checkpoint(tmp_path):
    """tools/convert_torch.py --reverse round-trips through the on-disk
    reference checkpoint format: npz -> {epoch, model, acc, best_acc,
    conf} -> convert() reproduces the tree."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from mobilenet_yolo_tpu.tools_io import save_params_npz
    from tools.convert_torch import load_torch_state_dict, main

    model = MBv2YOLO(num_classes=20, num_anchors=3)
    variables = _flax_tree(model)
    npz = str(tmp_path / "params.npz")
    save_params_npz(npz, variables["params"], variables["batch_stats"])
    out = str(tmp_path / "exported.pth.tar")
    main(["--reverse", "--params", npz, "--out", out,
          "--val-conf", "0.17", "--epoch", "42", "--best-acc", "0.71"])

    ckpt = torch.load(out, weights_only=False)
    assert ckpt["epoch"] == 42 and ckpt["conf"] == pytest.approx(0.17)
    assert ckpt["best_acc"] == pytest.approx(0.71)
    sd = load_torch_state_dict(out)          # reads ckpt["model"]
    params, stats = convert(sd, mbv2_yolo_mapping())

    def assert_equal(a, b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import jax
    jax.tree.map(assert_equal, dict(variables["params"]), params)
    jax.tree.map(assert_equal, dict(variables["batch_stats"]), stats)
