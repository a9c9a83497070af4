"""Fused inverted-residual Pallas kernels vs the XLA reference
(interpret mode on CPU; compiled equivalence is exercised on TPU in
perf probes — see PERF.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mobilenet_yolo_tpu.kernels.pallas_fused import (
    fused_inverted_residual,
    fused_inverted_residual_s2,
    xla_inverted_residual,
)


def _mk(rng, B, H, W, Cin, Ch, Cout):
    return (
        jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (Cin, Ch)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (Ch,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (3, 3, Ch)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (Ch,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (Ch, Cout)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32)),
    )


@pytest.mark.parametrize("residual", [True, False])
def test_fused_s1_matches_xla(rng, residual):
    args = _mk(rng, 2, 16, 24, 24, 96, 24)
    ref = xla_inverted_residual(*args, residual=residual)
    got = fused_inverted_residual(*args, residual=residual, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_s1_unaligned_width(rng):
    # W+2 not a multiple of 8 exercises the alignment-fill columns
    args = _mk(rng, 1, 8, 11, 8, 48, 8)
    ref = xla_inverted_residual(*args, residual=True)
    got = fused_inverted_residual(*args, residual=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_s2_matches_xla(rng):
    args = _mk(rng, 2, 32, 48, 16, 96, 24)
    ref = xla_inverted_residual(*args, residual=False, stride=2)
    got = fused_inverted_residual_s2(*args, interpret=True)
    assert got.shape == (2, 16, 24, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_s2_odd_tiles(rng):
    args = _mk(rng, 1, 44, 44, 8, 48, 16)
    ref = xla_inverted_residual(*args, residual=False, stride=2)
    got = fused_inverted_residual_s2(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_stem_block0_matches_xla(rng):
    from mobilenet_yolo_tpu.kernels.pallas_fused import (fused_stem_block0,
                                                         xla_stem_block0)
    B, H, W, Ch, Cout = 2, 32, 40, 32, 16
    x = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)).astype(np.float32)
                    / 255.0 - 0.5)
    args = (
        jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, Ch)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (Ch,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (3, 3, Ch)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (Ch,)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.2, (Ch, Cout)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, (Cout,)).astype(np.float32)),
    )
    ref = xla_stem_block0(x, *args)
    got = fused_stem_block0(x, *args, interpret=True)
    assert got.shape == (B, H // 2, W // 2, Cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_block0_matches_model(rng):
    """Against the real MBv2 stem+block0 with BN-folded weights."""
    from mobilenet_yolo_tpu.kernels.pallas_fused import fused_stem_block0
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from mobilenet_yolo_tpu.models.bn_fold import fold_batchnorm

    model = MBv2YOLO(num_classes=3, num_anchors=3)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    folded = fold_batchnorm(variables)
    bb = folded["params"]["backbone"]
    bs = lambda m: folded["params"]["backbone"][m]["bn"]["bias"]

    got = fused_stem_block0(
        x,
        bb["stem"]["conv"]["kernel"], bs("stem"),
        bb["block0"]["depthwise"]["conv"]["kernel"][:, :, 0, :],
        bb["block0"]["depthwise"]["bn"]["bias"],
        bb["block0"]["project"]["conv"]["kernel"][0, 0],
        bb["block0"]["project"]["bn"]["bias"],
        interpret=True)

    # reference: run the folded model and capture block0's output
    _, state = model.apply(folded, x, train=False,
                           capture_intermediates=True,
                           mutable=["intermediates"])
    ref = state["intermediates"]["backbone"]["block0"]["__call__"][0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
