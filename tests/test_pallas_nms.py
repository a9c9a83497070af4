"""Pallas suppression kernel vs the XLA scan (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from mobilenet_yolo_tpu.kernels.pallas_nms import pallas_suppress
from mobilenet_yolo_tpu.ops.nms import _suppress_scan
import jax


def _random_over(rng, b=2, k=128, density=0.1):
    over = (rng.random((b, k, k)) < density).astype(np.float32)
    later = np.triu(np.ones((k, k), bool), 1)
    over = over * later  # strictly-later mask, as batched_nms produces
    valid = (rng.random((b, k)) < 0.8).astype(np.float32)
    return over, valid


def test_pallas_matches_xla_scan(rng):
    over, valid = _random_over(rng)
    keep_pallas = np.asarray(
        pallas_suppress(jnp.asarray(over), jnp.asarray(valid), interpret=True))
    keep_xla = np.asarray(
        jax.vmap(_suppress_scan)(jnp.asarray(over), jnp.asarray(valid) > 0.5))
    np.testing.assert_array_equal(keep_pallas, keep_xla)


def test_pallas_chain_suppression():
    """a suppresses b, b would suppress c: c must survive (b is dead)."""
    k = 128
    over = np.zeros((1, k, k), np.float32)
    over[0, 0, 1] = 1.0
    over[0, 1, 2] = 1.0
    valid = np.zeros((1, k), np.float32)
    valid[0, :3] = 1.0
    keep = np.asarray(pallas_suppress(jnp.asarray(over), jnp.asarray(valid),
                                      interpret=True))
    assert keep[0, 0] and not keep[0, 1] and keep[0, 2]
    assert not keep[0, 3:].any()
