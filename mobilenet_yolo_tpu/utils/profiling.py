"""Tracing / timing helpers.

The reference's only instrumentation is wall-clock prints
(inference.py:120-124, eval_mAP.py:135,183-187). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-viewable device trace.
* :func:`chained_timer` — honest step timing on asynchronous runtimes:
  serializes N executions by feeding each call a data dependency on the
  previous output and bounds the chain with one scalar fetch
  (``block_until_ready`` can return early under remote-execution relays).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_timer(fn: Callable, x, *args, iters: int = 32,
                  warmup: int = 3) -> float:
    """Mean seconds per call of ``fn(x, *args)``.

    ``fn`` must return an array (or pytree whose first leaf is an array);
    ``x`` must be a float array input that the chain can perturb.
    """

    @jax.jit
    def add_dep(x, out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        scalar = jnp.ravel(leaf)[0].astype(x.dtype)
        return x * (1.0 + 0.0 * scalar)

    y = x
    for _ in range(warmup):
        out = fn(y, *args)
        y = add_dep(x, out)
    _ = float(jnp.ravel(y)[0])

    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(y, *args)
        y = add_dep(x, out)
    _ = float(jnp.ravel(y)[0])
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Accumulates wall-clock per named phase (host-side, coarse)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
