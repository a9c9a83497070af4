"""cli/infer.py end-to-end: single-image (the reference inference.py
contract — <name>_result.jpg with drawn boxes) and the batched directory
mode (one compiled program, padded tail batch)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_configs(tmp_path):
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(
        "img_w: 96\nimg_h: 96\nbatch_size: 2\ntrain_img_size: [[96, 96]]\n"
        "iou_weighting: 0.02\n"
        "normalize:\n  mean: [0.5, 0.5, 0.5]\n  std: [1.0, 1.0, 1.0]\n"
        "yolo:\n  num_classes: 3\n  num_anchors: 3\n"
        "  ignore_thresh: [0.6, 0.55]\n  iou_thresh: 0.55\n"
        "  anchors: [[20, 24], [30, 30], [44, 40], [6, 8], [10, 14], "
        "[14, 10]]\n"
        "  mask: [[0, 1, 2], [3, 4, 5]]\n")
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(
        "train_root: .\ntest_root: .\n"
        f"model_config_path: {model_yaml}\n"
        "classes:\n  map: [background, cat, dog]\n")
    return str(data_yaml)


def _write_images(d, n, rng):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (120, 160, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"im{i}.jpg"))


def test_single_image(tmp_path, rng, capsys):
    from mobilenet_yolo_tpu.cli import infer

    data_yaml = _write_configs(tmp_path)
    _write_images(str(tmp_path / "imgs"), 1, rng)
    args = infer.get_args([
        "-y", data_yaml, "-i", str(tmp_path / "imgs" / "im0.jpg"),
        "--img-size", "96", "--val-conf", "0.05", "--random-weights",
        "--out-dir", str(tmp_path / "save")])
    out_path = infer.main(args)
    assert out_path.endswith("im0_result.jpg") and os.path.isfile(out_path)
    assert "model inference time" in capsys.readouterr().out


def test_directory_batched(tmp_path, rng, capsys):
    """5 images at batch 2: three batches (tail padded), every image gets
    its annotated <name>_result.jpg."""
    from mobilenet_yolo_tpu.cli import infer

    data_yaml = _write_configs(tmp_path)
    _write_images(str(tmp_path / "imgs"), 5, rng)
    args = infer.get_args([
        "-y", data_yaml, "-i", str(tmp_path / "imgs"),
        "--img-size", "96", "--val-conf", "0.05", "--random-weights",
        "--batch-size", "2", "--out-dir", str(tmp_path / "save")])
    written = infer.main(args)
    assert len(written) == 5
    for i in range(5):
        p = os.path.join(str(tmp_path / "save"), f"im{i}_result.jpg")
        assert os.path.isfile(p)
        with Image.open(p) as im:
            assert im.size == (160, 120)   # original resolution preserved
    assert "img/s" in capsys.readouterr().out


def test_directory_empty_raises(tmp_path, rng):
    from mobilenet_yolo_tpu.cli import infer

    data_yaml = _write_configs(tmp_path)
    os.makedirs(tmp_path / "empty")
    args = infer.get_args([
        "-y", data_yaml, "-i", str(tmp_path / "empty"),
        "--img-size", "96", "--random-weights",
        "--out-dir", str(tmp_path / "save")])
    with pytest.raises(FileNotFoundError):
        infer.main(args)


def test_directory_same_stem_no_overwrite(tmp_path, rng):
    """im0.jpg + im0.png must produce two distinct result files."""
    from mobilenet_yolo_tpu.cli import infer

    data_yaml = _write_configs(tmp_path)
    d = str(tmp_path / "imgs")
    os.makedirs(d)
    img = rng.integers(0, 255, (60, 80, 3), np.uint8)
    Image.fromarray(img).save(os.path.join(d, "im0.jpg"))
    Image.fromarray(img ^ 255).save(os.path.join(d, "im0.png"))
    args = infer.get_args([
        "-y", data_yaml, "-i", d, "--img-size", "96", "--val-conf", "0.05",
        "--random-weights", "--batch-size", "2",
        "--out-dir", str(tmp_path / "save")])
    written = infer.main(args)
    assert len(written) == 2 and len(set(written)) == 2
    for p in written:
        assert os.path.isfile(p)
