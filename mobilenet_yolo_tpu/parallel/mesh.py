"""Device mesh + sharding specs.

The reference has no active parallelism (SURVEY.md §2.4: torch.distributed
imported but never initialized, train.py:12-18,128). Here data-parallelism
is first-class and free: the train/eval steps are jitted with the batch
sharded over a 1-D ``data`` mesh axis; XLA inserts the gradient all-reduce
over ICI. A ``model`` axis is exposed so tensor-parallel sharding is a
config choice rather than a rewrite (the ~5M-param model doesn't need it,
but head convs and the loss are written shard_map-compatible).

Multi-host: call :func:`initialize_distributed` before mesh creation;
``jax.distributed.initialize`` wires DCN between hosts and each host feeds
its local shard of the batch.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def create_mesh(n_data: int | None = None, n_model: int = 1,
                devices=None) -> Mesh:
    """1-D or 2-D mesh over the available devices.

    Axis names: ``data`` (batch/DP) and ``model`` (TP, usually size 1).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model <= devices.size, (n_data, n_model, devices.size)
    grid = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree of batch arrays onto the mesh, batch-sharded.

    Single-host: plain device_put with the global sharding. Multi-host:
    each process holds only its slice of the global batch (the input
    pipeline shards per process), so assemble the global array from the
    process-local shards instead — device_put would treat the local slice
    as the whole global array.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
