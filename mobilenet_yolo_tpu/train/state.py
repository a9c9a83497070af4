"""Train state: params + batch_stats + AdamW optimizer state + bookkeeping.

Carries exactly what the reference checkpoints carry
(train.py:175-182: epoch, model state_dict, acc, best_acc, optimizer
state_dict, val_conf) as one pytree so Orbax snapshots it atomically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_optimizer(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """AdamW matching the reference recipe (train.py:134: lr 7e-4, wd 4e-4,
    torch defaults betas (0.9, 0.999), eps 1e-8, decoupled weight decay).

    The LR is injected as a mutable hyperparameter so the epoch schedule
    never recompiles the step.
    """
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay,
    )


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray          # scalar int32
    best_acc: jnp.ndarray       # scalar float32 (best mAP so far)
    val_conf: jnp.ndarray       # scalar float32 (feedback-controlled gate)
    # batches already consumed in the CURRENT epoch (0 = epoch boundary).
    # Set by mid-epoch checkpointing (TrainerConfig.checkpoint_every_
    # batches); on resume the Trainer fast-forwards the Loader past them —
    # exceeding the reference, whose resume granularity is whole epochs
    # (train.py:138-153).
    batch_idx: jnp.ndarray      # scalar int32
    # exponential moving average of ``params`` (None = EMA off). Updated
    # by the train steps when built with ``ema_decay``; evaluation and
    # best-checkpoint selection then use these weights (the standard
    # detector-training stabilizer — the reference has no equivalent).
    # BN running stats are already their own moving average, so the live
    # ``batch_stats`` pair with the EMA params.
    ema_params: Any = None

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def with_lr(self, lr: float) -> "TrainState":
        opt_state = self.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=opt_state)


def create_train_state(
    model,
    rng,
    img_size: tuple[int, int],
    learning_rate: float = 7e-4,
    weight_decay: float = 4e-4,
    val_conf: float = 0.1,
    batch_size: int = 2,
    ema: bool = False,
) -> tuple[TrainState, optax.GradientTransformation]:
    w, h = img_size
    x = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(rng, x, train=False))()
    tx = make_optimizer(learning_rate, weight_decay)
    opt_state = tx.init(variables["params"])
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
        epoch=jnp.asarray(0, jnp.int32),
        best_acc=jnp.asarray(0.0, jnp.float32),
        val_conf=jnp.asarray(val_conf, jnp.float32),
        batch_idx=jnp.asarray(0, jnp.int32),
        ema_params=(jax.tree.map(jnp.array, variables["params"])
                    if ema else None),
    )
    return state, tx
