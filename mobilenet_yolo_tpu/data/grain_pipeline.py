"""Grain-backed input pipeline (optional alternative to data/pipeline.py).

Uses ``grain.MapDataset`` over the deterministic epoch batch plan (the same
plan the hand-rolled Loader derives: mosaic groups + per-batch multiscale
size + per-host sharding). Grain contributes worker multiprocessing and a
checkpointable iterator; each grain element is one complete batch so worker
parallelism is at batch granularity.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from mobilenet_yolo_tpu.data.pipeline import Loader


class GrainLoader(Loader):
    """Loader with grain-powered prefetching of the batch plan."""

    def __init__(self, *args, num_workers: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_workers = num_workers
        if self.device_geometry:
            # grain's to_iter_dataset prefetches MANY elements on threads
            # (ReadOptions default: 16 threads, 500-element buffer), so a
            # small reuse ring would alias queued batches and concurrent
            # load() calls would race on it — every grain batch gets a
            # fresh slots array instead
            self._use_slot_ring = False

    def _epoch_batches(self) -> Iterator[dict]:
        import grain

        plan, p_idx = self._sharded_plan()
        skip, self._skip_batches = self._skip_batches, 0
        seed, epoch = self.seed, self.epoch

        def load(entry):
            batch_idx, (groups, size_idx) = entry
            b_rng = np.random.default_rng((seed, epoch, p_idx, batch_idx))
            if self.device_geometry:
                # same branch as Loader._epoch_batches (with the reuse
                # ring disabled — see __init__)
                w, h = self.transform_size[size_idx]
                stage = self.planner.stage_size or max(w, h)
                plans = [self.planner.plan_group(
                    [self.ds.decode_source(i)[:5 if self.ds.has_seg else 4]
                     for i in g], b_rng,
                    stage=stage) for g in groups]
                return self._collate_geometry(plans, size_idx)
            samples = [self.ds.get_group(g, b_rng) for g in groups]
            return self._collate(samples, size_idx, rng=b_rng)

        # mid-epoch resume: drop already-consumed plan entries (batch rng
        # is index-keyed, so the remainder is bit-identical to the
        # uninterrupted run)
        ds = grain.MapDataset.source(
            list(enumerate(plan))[skip:]).map(load)
        it = ds.to_iter_dataset()
        if self.num_workers:
            it = it.mp_prefetch(
                grain.multiprocessing.MultiprocessingOptions(
                    num_workers=self.num_workers))
        yield from it
