"""Grain-backed input pipeline (optional alternative to data/pipeline.py).

Uses ``grain.MapDataset`` over the record shards with the same semantics as
the hand-rolled Loader: mosaic group sampling, per-batch multiscale resize,
fixed-shape GT padding. Grain provides deterministic shuffling, worker
multiprocessing and checkpointable iterators; per-host sharding for
multi-host training comes from ``grain.sharding.ShardByJaxProcess``.

The mosaic *grouping* (variable 1..N source images per composed sample,
CustomBatchSampler.py:48-73) doesn't fit grain's one-record-per-index
model directly, so each epoch pre-materialises the group index list and
grain maps over groups.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from mobilenet_yolo_tpu.data.mosaic import group_indices
from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader


class GrainLoader(Loader):
    """Loader with grain-powered shuffling/prefetching of sample groups."""

    def __init__(self, *args, num_workers: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_workers = num_workers

    def _epoch_batches(self) -> Iterator[dict]:
        import grain

        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        if self.ds.phase == "train":
            groups: list[list[int]] = [
                g for batch in group_indices(order, self.batch_size,
                                             self.mosaic_num, rng,
                                             self.drop_last)
                for g in batch]
        else:
            groups = [[int(i)] for i in order]

        ds = grain.MapDataset.source(groups)
        seed = int(rng.integers(0, 2 ** 31 - 1))

        def load_group(group):
            g_rng = np.random.default_rng((seed, *group))
            return self.ds.get_group(list(group), g_rng)

        ds = ds.map(load_group)
        it = ds.to_iter_dataset()
        if self.num_workers:
            it = it.mp_prefetch(
                grain.multiprocessing.MultiprocessingOptions(
                    num_workers=self.num_workers))

        batch, n = [], self.batch_size
        for sample in it:
            batch.append(sample)
            if len(batch) == n:
                yield self._collate(batch, rng)
                batch = []
        if batch and not self.drop_last:
            if self.pad_final and self.ds.phase == "train":
                while len(batch) < n:
                    batch.append(load_group(
                        [int(order[int(rng.integers(0, len(order)))])]))
            yield self._collate(batch, rng)
