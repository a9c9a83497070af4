"""Learning-rate schedule.

Reference semantics (train.py:164-185,441-450): the LR starts at
``base * 0.5^len(warm_up)`` (every warm-up epoch pre-halves it before the
loop), doubles at each warm-up epoch, and halves at each schedule epoch
({100, 170, 240} by default). Both adjustments fire *before* that epoch's
training pass, so the epoch itself trains at the new rate.
"""

from __future__ import annotations

from typing import Sequence

DEFAULT_SCHEDULE = (100, 170, 240)


def learning_rate_for_epoch(
    base_lr: float,
    epoch: int,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    warm_up: Sequence[int] = (),
) -> float:
    lr = base_lr * (0.5 ** len(warm_up))
    for e in warm_up:
        if epoch >= e:
            lr *= 2.0
    for e in schedule:
        if epoch >= e:
            lr *= 0.5
    return lr
