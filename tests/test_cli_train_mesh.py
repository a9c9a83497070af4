"""cli/train.py --mesh: the front-door multi-chip path end-to-end on the
virtual 8-device mesh (synthetic data, one epoch)."""

import jax
import numpy as np
import pytest


def test_cli_train_synthetic_on_mesh(tmp_path, monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # keep the TB event files out of the repo's tensorboard/ dir
    monkeypatch.setenv("NNI_OUTPUT_DIR", str(tmp_path))
    from mobilenet_yolo_tpu.cli.train import get_params, main

    ck = str(tmp_path / "ck")
    args = get_params([
        "--synthetic", "--epochs", "1", "--steps-per-epoch", "2",
        "--batch-size", "8", "--img-size", "64", "--mesh", "8",
        "-c", ck, "-o", ck])
    best = main(args)
    assert np.isfinite(best)


def test_cli_train_rejects_indivisible_mesh(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from mobilenet_yolo_tpu.cli.train import get_params, main

    args = get_params([
        "--synthetic", "--epochs", "1", "--steps-per-epoch", "1",
        "--batch-size", "6", "--img-size", "64", "--mesh", "8",
        "-c", str(tmp_path / "ck")])
    with pytest.raises(ValueError, match="not divisible"):
        main(args)
