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

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def multihost_env_detected() -> bool:
    """True when the environment looks like one process of a multi-host
    job (TPU pod slice or an explicitly-coordinated launch) — i.e. when a
    no-arg ``jax.distributed.initialize()`` has something to wire up.

    Detection is deliberately conservative: a plain single-host run must
    never trip it (``jax.distributed.initialize`` would then block waiting
    for a coordinator).
    """
    env = os.environ
    if env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS"):
        return True
    # Cloud TPU pod slice: the runtime exports the worker roster
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if "," in hostnames:
        return True
    try:
        if int(env.get("JAX_NUM_PROCESSES", "1")) > 1:
            return True
    except ValueError:
        pass
    return False


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host bring-up; returns True when distributed was initialized.

    Explicit coordinates take precedence; with none given, auto-detects a
    multi-host environment (:func:`multihost_env_detected`) and calls the
    no-arg ``jax.distributed.initialize()`` that self-configures on TPU
    pods. A plain single host is a no-op, so CLIs can call this
    unconditionally before touching ``jax.devices()``.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
        return True
    if coordinator is None and num_processes is None \
            and multihost_env_detected():
        jax.distributed.initialize()
        return True
    return False


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


def mesh_from_spec(spec: str, batch_size: int | None = None) -> Mesh | None:
    """CLI-facing mesh construction from a ``--mesh`` spec string.

    * ``auto``  — a 1-D ``data`` mesh over all visible devices when there
      is more than one, else no mesh (single-device jit);
    * ``none``/``off``/``1`` — force single-device;
    * ``N``     — N-way data parallelism;
    * ``NxM``   — N-way data x M-way model (tensor) parallelism.

    ``batch_size`` (the GLOBAL batch) is validated against the data axis —
    an indivisible batch would fail deep inside GSPMD otherwise.
    """
    spec = (spec or "auto").strip().lower()
    if spec in ("none", "off", "1"):
        return None
    n_dev = len(jax.devices())
    if spec == "auto":
        if n_dev <= 1:
            return None
        n_data, n_model = n_dev, 1
    elif "x" in spec:
        a, b = spec.split("x", 1)
        n_data, n_model = int(a), int(b)
    else:
        n_data, n_model = int(spec), 1
    if n_data * n_model > n_dev:
        raise ValueError(
            f"--mesh {spec} needs {n_data * n_model} devices, "
            f"{n_dev} visible")
    if batch_size is not None and batch_size % n_data:
        raise ValueError(
            f"global batch {batch_size} is not divisible by the mesh's "
            f"data axis {n_data}; adjust --batch-size or --mesh")
    return create_mesh(n_data=n_data, n_model=n_model)


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
