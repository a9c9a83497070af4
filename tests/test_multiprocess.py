"""Executed multi-host proof: real 2- and 4-process ``jax.distributed`` jobs.

SURVEY.md §2.4 mandates parallelism as first-class; until now the
multi-host path (parallel/mesh.py:initialize_distributed, per-host input
sharding, shard_batch assembly) had only ever run as a single-process
simulation. These tests spawn actual multi-process jobs on localhost CPUs
(2 processes x 2 virtual devices = the same 4-device global mesh as the
single-process reference run) and assert:

* DP: all ranks produce bit-identical loss/mAP/val_conf, matching the
  single-process run on the same global data (train step collectives ride
  gloo across processes) — proven at 2 processes x 2 devices AND at
  4 processes x 1 device (the roster/slicing logic generalizes past N=2);
* TP (2x2 mesh): multi-host training AND in-loop evaluation work with
  tensor-parallel params (the round-3 NotImplementedError is gone) and
  match the single-process TP run;
* the CLI front door (``cli.train --coordinator/--num-processes/
  --process-id``) runs a full fit (train + lockstep eval + Orbax
  checkpoint) across 2 processes.

Workers run tests/mp_worker.py; see docs/TRAINING.md §5.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache-tests"
    return env


def _run_workers(tmp_path, mode: str, num_processes: int,
                 timeout: int = 900, _retry: bool = True) -> list[dict]:
    """Launch mp_worker ranks concurrently; return their JSON results."""
    port = _free_port()
    local_devices = 4 // num_processes
    procs, outs = [], []
    for pid in range(num_processes):
        out = tmp_path / f"{mode}_{num_processes}p_rank{pid}.json"
        outs.append(out)
        cmd = [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
               "--mode", mode, "--ckpt", str(tmp_path / f"ckpt_{mode}"),
               "--out", str(out),
               "--num-processes", str(num_processes),
               "--process-id", str(pid)]
        if num_processes > 1:
            cmd += ["--coordinator", f"localhost:{port}"]
        procs.append(subprocess.Popen(
            cmd, env=_env(local_devices), cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    results, logs = [], []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=timeout)
        logs.append((p.returncode, stdout, out))
    if any(rc != 0 for rc, _, _ in logs):
        combined = "\n".join(s for _, s, _ in logs)
        # XLA's gloo clique rendezvous rides the coordination KV store
        # under a HARDCODED ~30s GetKeyValue deadline; on a loaded 1-core
        # host the ranks' independent compiles can skew past it. That is
        # a machine-load artifact, not a product failure — the in-tree
        # mitigations (mesh.py:warmup_collectives now pre-creates every
        # clique shape; sync_processes phase barriers bound the skew) make
        # it rare but cannot equalize compile times, so ONE retry — and
        # ONLY for the clique-CREATION signature ("Gloo context
        # initialization failed"): restricting further to pre-first-
        # collective failures was considered and measured wrong (2026-08-21
        # full-suite run: the global 4-device clique formed at the first
        # EVAL program, long after WARMUP_OK). A deadline in an
        # already-created context, or any other failure, fails the test.
        ctx_init = "Gloo context initialization failed" in combined
        if _retry and ctx_init and "DEADLINE_EXCEEDED" in combined:
            import shutil
            shutil.rmtree(tmp_path / f"ckpt_{mode}", ignore_errors=True)
            return _run_workers(tmp_path, mode, num_processes,
                                timeout=timeout, _retry=False)
        for rc, stdout, _ in logs:
            assert rc == 0, f"rank failed:\n{stdout[-4000:]}"
    for _, _, out in logs:
        with open(out) as f:
            results.append(json.load(f))
    return results


SCALARS = ("loss", "avg_iou", "mAP", "val_conf")


@pytest.fixture(scope="module")
def tmp(tmp_path_factory):
    return tmp_path_factory.mktemp("mp")


@pytest.fixture(scope="module")
def dp_reference(tmp):
    """Single-process 4-device run — the equivalence oracle."""
    return _run_workers(tmp, "dp", num_processes=1)[0]


def test_two_process_dp_matches_single_process(tmp, dp_reference):
    ranks = _run_workers(tmp, "dp", num_processes=2)
    # both ranks observe identical replicated metrics — exact
    for key in SCALARS:
        assert ranks[0][key] == ranks[1][key], (key, ranks)
    # and the 2-process run reproduces the single-process run on the same
    # global mesh/data. Not bit-exact: cross-process reductions ride gloo
    # (vs in-process collectives) whose different accumulation order is
    # then amplified by Adam's grad/sqrt(v) normalization at step 1 —
    # observed ~7e-4 relative on the post-update loss.
    _assert_matches(ranks[0], dp_reference)
    assert np.isfinite(ranks[0]["loss"])


def _assert_matches(got: dict, ref: dict):
    np.testing.assert_allclose(got["loss"], ref["loss"], rtol=3e-3,
                               err_msg="loss")
    np.testing.assert_allclose(got["avg_iou"], ref["avg_iou"], rtol=3e-3,
                               atol=1e-4, err_msg="avg_iou")
    # mAP/val_conf derive from score-threshold counts: a detection sitting
    # at the gate can flip under 1e-6-level numeric drift, so compare with
    # discrete-step tolerances (one controller step is 0.01)
    np.testing.assert_allclose(got["mAP"], ref["mAP"], atol=0.02,
                               err_msg="mAP")
    np.testing.assert_allclose(got["val_conf"], ref["val_conf"], atol=0.011,
                               err_msg="val_conf")


def test_two_process_tensor_parallel_train_and_eval(tmp, dp_reference):
    """2-process 2x2 (DP x TP) mesh: the train step runs with params
    sharded over the model axis across hosts, and in-loop evaluation —
    a hard NotImplementedError through round 3 — produces the same
    metrics as the plain DP run (TP only re-tiles the math)."""
    ranks = _run_workers(tmp, "tp", num_processes=2)
    for key in SCALARS:
        assert ranks[0][key] == ranks[1][key], (key, ranks)
    _assert_matches(ranks[0], dp_reference)


def test_four_process_dp_matches_single_process(tmp, dp_reference):
    """4 processes x 1 local device (same 4-device global mesh): proves
    the roster/slicing logic generalizes past N=2 — each rank contributes
    ONE device and a 2-row slice of every global batch, `shard_batch`
    assembles 4 per-process slices, and eval's `global_batch` pulls each
    host's rows from a 4-way host split. Reuses the module-scoped
    single-process oracle, so cost is one extra 4-rank job."""
    ranks = _run_workers(tmp, "dp", num_processes=4)
    assert len(ranks) == 4
    for key in SCALARS:
        assert len({r[key] for r in ranks}) == 1, (key, ranks)
    _assert_matches(ranks[0], dp_reference)


def test_cli_front_door_two_process_fit(tmp):
    """The actual CLI: 2-process synthetic fit with mesh 4, lockstep eval
    and a shared Orbax checkpoint directory."""
    port = _free_port()
    ckpt = tmp / "cli_ckpt"
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "mobilenet_yolo_tpu.cli.train",
               "--synthetic", "--epochs", "2", "--steps-per-epoch", "2",
               "--batch-size", "8", "--img-size", "96", "--mesh", "4",
               "--learning_rate", "1e-3", "--schedule", "999",
               "-c", str(ckpt),
               "--coordinator", f"localhost:{port}",
               "--num-processes", "2", "--process-id", str(pid)]
        procs.append(subprocess.Popen(
            cmd, env=_env(2), cwd=str(tmp),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"CLI rank failed:\n{stdout[-4000:]}"
        outs.append(stdout)
    assert "jax.distributed: process 0 of 2" in outs[0]
    assert "jax.distributed: process 1 of 2" in outs[1]
    # rank 0 carries the human-facing output; both finish the fit
    best = [line for line in outs[0].splitlines() if "best mAP" in line]
    assert best, outs[0][-2000:]
    # the shared Orbax checkpoint dir holds the per-epoch saves
    steps = [d for d in os.listdir(ckpt) if d.isdigit()]
    assert "2" in steps, sorted(os.listdir(ckpt))
