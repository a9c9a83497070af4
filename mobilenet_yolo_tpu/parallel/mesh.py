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


def _enable_cpu_collectives() -> None:
    """Cross-process collectives on the CPU backend need an explicit
    implementation (gloo ships with jaxlib); TPU/GPU runs are unaffected.
    Lets multi-host code paths be exercised as real multi-process jobs on
    localhost CPUs (tests/test_multiprocess.py)."""
    if (os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
            or (jax.config.jax_platforms or "").startswith("cpu")):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jaxlib without the option: single-host CPU only


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
        _enable_cpu_collectives()
        jax.distributed.initialize(coordinator, num_processes, process_id)
        return True
    if coordinator is None and num_processes is None \
            and multihost_env_detected():
        _enable_cpu_collectives()
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


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the cross-process communicator with one tiny collective.

    On the CPU backend's gloo collectives the communicator context is
    created on first use under a hard ~30s key-value rendezvous deadline;
    the first REAL program's per-process compile skew (each process
    compiles independently — minutes apart on a slow shared host) can blow
    that deadline and fail the job with "Gloo context initialization
    failed: DEADLINE_EXCEEDED". One trivially-compiled all-gather up
    front, while every process is still in lockstep from
    ``jax.distributed.initialize``, creates the context that later
    programs reuse. No-op single-process; cheap (one scalar per device)
    on real pods.
    """
    if jax.process_count() <= 1:
        return
    # Warm ONE collective per clique shape the later programs will form:
    # an all-gather sharded over a SINGLE axis only creates that axis's
    # pairwise cliques (measured 2026-08-21: on a 2x2 DP x TP mesh the
    # data-axis warmup left the global 4-device clique uncreated, and its
    # rendezvous at the FIRST EVAL program blew the 30s deadline on a
    # loaded host). Per-axis plus the full device set covers every group
    # the train/eval steps use.
    axis_specs = [P(name) for name in mesh.axis_names if
                  mesh.shape[name] > 1]
    multi = [n for n in mesh.axis_names if mesh.shape[n] > 1]
    if len(multi) > 1:
        axis_specs.append(P(tuple(multi)))
    for spec in axis_specs:
        data = NamedSharding(mesh, spec)
        x = jax.device_put(np.arange(mesh.devices.size, dtype=np.float32),
                           data)
        # sharded input -> replicated output forces a real all-gather
        out = jax.jit(lambda v: v * 1.0, in_shardings=data,
                      out_shardings=NamedSharding(mesh, P()))(x)
        np.asarray(out)  # block until the collective completed everywhere


_BARRIER_SEQ = [0]


def sync_processes(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier via the coordination service (NOT gloo).

    Gloo communicator cliques rendezvous through the distributed KV store
    under a hardcoded ~30s ``GetKeyValue`` deadline; each newly-shaped
    collective (e.g. the first eval program after an epoch of training)
    re-rendezvouses, and per-process compile skew on a loaded host can
    exceed 30s and kill the job with DEADLINE_EXCEEDED. The coordination
    service's barrier has a configurable (long) deadline and no gloo
    dependency, so a barrier at phase boundaries re-synchronizes the ranks
    before they reach the next clique rendezvous. No-op single-process.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:  # pragma: no cover - initialize() always sets it
        return
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(f"myt_{name}_{_BARRIER_SEQ[0]}", timeout_ms)


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


def global_batch(mesh: Mesh, tree):
    """Place HOST-COMPLETE batch arrays onto the mesh, batch-sharded.

    The dual of :func:`shard_batch`: there every process holds only its
    slice of the global batch; here every process holds the SAME full
    batch (e.g. the deterministic eval loader run identically on each
    host) and each host's devices pull just the rows they own via
    ``make_array_from_callback`` — no cross-host data movement, and the
    device work still splits over the whole ``data`` axis. Scalars /
    rank-0 leaves are replicated.

    This is what makes multi-host evaluation cost 1x device time while
    keeping metrics (and the val_conf controller) in lockstep on every
    host: the batch is globally sharded for the forward, the replicated
    outputs are readable on every process, and the host-side GT is already
    host-complete.
    """

    def place(x):
        x = np.asarray(x)
        spec = P("data") if x.ndim else P()
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(place, tree)
