"""Tensor-parallel parameter sharding.

The detector is small (~5M params), so TP is a *config choice*, not a
necessity (SURVEY.md §2.4). The rule here shards the output-channel
dimension of large conv kernels (and any matching per-channel vectors:
biases, BN params, Adam moments — matched by shape) over the ``model``
mesh axis; everything else is replicated. GSPMD then partitions the
matmuls/convs and inserts the collectives — no model-code changes.

Applied by ``device_put``-ing the whole TrainState through the rule;
``jax.jit`` without explicit in_shardings propagates the placements.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_sharding(leaf, mesh: Mesh, min_channels: int) -> NamedSharding:
    tp = mesh.shape.get("model", 1)
    shape = getattr(leaf, "shape", ())
    if tp > 1 and len(shape) >= 1 and shape[-1] >= min_channels \
            and shape[-1] % tp == 0:
        spec = [None] * (len(shape) - 1) + ["model"]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_over_model_axis(tree, mesh: Mesh, min_channels: int = 256):
    """Place every array leaf per the output-channel TP rule."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, _leaf_sharding(leaf, mesh, min_channels))
        if hasattr(leaf, "shape") and np.ndim(leaf) > 0 else leaf,
        tree)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, repl)
        if hasattr(leaf, "shape") else leaf, tree)
