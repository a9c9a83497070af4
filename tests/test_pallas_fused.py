"""Fused inverted-residual Pallas kernels vs the XLA reference
(interpret mode on CPU; compiled equivalence is exercised on TPU in
perf probes — see PERF.md)."""

import numpy as np
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
