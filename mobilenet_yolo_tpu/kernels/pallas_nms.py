"""Pallas TPU kernel for the sequential NMS suppression scan.

The batched NMS (ops/nms.py) splits into two parts: the O(K^2) IoU/overlap
matrix (embarrassingly parallel — XLA handles it on the VPU) and the
inherently sequential greedy suppression scan. This kernel runs the scan
entirely in VMEM with one program per image, replacing a K-step XLA
``fori_loop`` of small HLO ops with a single fused kernel.

The scan is expressed without scalar VMEM indexing (TPU-unfriendly on the
lane dimension): per step the candidate row is selected with a dynamic
slice on the sublane dimension, and scalars are extracted via one-hot
masked reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(over_ref, valid_ref, keep_ref):
    k = over_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid = valid_ref[0, 0:1, :]                            # (1, K)

    def body(i, state):
        suppressed, keep = state
        alive_vec = valid * (1.0 - suppressed)              # (1, K)
        onehot = (col == i).astype(jnp.float32)
        alive_i = jnp.sum(alive_vec * onehot)               # scalar in {0,1}
        keep = keep + alive_vec * onehot                    # writes keep[i]
        row = over_ref[0, pl.ds(i, 1), :]                   # (1, K)
        suppressed = jnp.minimum(suppressed + alive_i * row, 1.0)
        return suppressed, keep

    zeros = jnp.zeros((1, k), jnp.float32)
    _, keep = jax.lax.fori_loop(0, k, body, (zeros, zeros))
    keep_ref[0, :, :] = jnp.broadcast_to(keep, keep_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_suppress(over, valid, interpret: bool = False):
    """Greedy suppression scan.

    over:  (B, K, K) float {0,1}; over[b, i, j] = 1 if candidate i (higher
           priority) suppresses candidate j when i survives. Must already be
           masked to strictly-later j (priority order).
    valid: (B, K) float {0,1} candidate validity.
    Returns keep: (B, K) bool.
    """
    b, k, _ = over.shape
    # TPU tiling wants the last two block dims divisible by (8, 128);
    # vector operands are carried as (B, 8, K) with row 0 live
    valid8 = jnp.broadcast_to(valid.astype(jnp.float32)[:, None, :], (b, 8, k))
    keep = pl.pallas_call(
        _suppress_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, k), jnp.float32),
        interpret=interpret,
    )(over.astype(jnp.float32), valid8)
    return keep[:, 0, :] > 0.5
