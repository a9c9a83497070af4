"""Orbax checkpointing with auto-resume.

Replaces the reference's two torch formats (per-epoch state dict +
whole-pickled-module best, train.py:425-433) with Orbax pytree snapshots
carrying ``{params, batch_stats, opt_state, epoch, best_acc, val_conf}``;
a retention policy keeps the latest N plus the best. ``restore_latest``
gives the reference's ``--resume`` semantics (train.py:138-153) without
naming a file.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from mobilenet_yolo_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get("mAP", 0.0),
            best_mode="max",
            keep_checkpoints_without_metrics=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, mAP: float | None = None,
             wait: bool = False):
        metrics = {"mAP": float(mAP)} if mAP is not None else None
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, step: int, template: TrainState) -> TrainState:
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, template)

    def restore_latest_flexible(self, template: TrainState
                                ) -> Optional[TrainState]:
        """Template restore that survives OPTIONAL-field drift.

        A strict ``restore_latest(template)`` rejects checkpoints whose
        field set differs from the template's — e.g. pre-``ema_params``
        checkpoints, or a run resumed with a different ``--ema-decay``
        setting. Here the restore template is built from the CHECKPOINT's
        own field set (so optax state classes survive), then merged into
        the caller's template: fields the checkpoint lacks keep the
        template default, saved-None optional fields restore as None, and
        turning EMA on over a non-EMA checkpoint seeds the average from
        the restored params. A non-None checkpoint field UNKNOWN to this
        TrainState (a removed/renamed field) cannot be reconstructed and
        raises — that is real schema breakage, not optional drift.
        """
        step = self.latest_step()
        if step is None:
            return None
        try:
            return self.restore(step, template)
        except Exception as strict_err:
            first_error = strict_err
        meta = self._mgr.item_metadata(step)
        tree = getattr(meta, "tree", None) or getattr(meta, "item", meta)
        saved = dict(tree) if hasattr(tree, "keys") else None
        if saved is None:
            raise RuntimeError(
                f"checkpoint {step} structure unreadable for flexible "
                "restore") from first_error
        tpl = {}
        for k, v in saved.items():
            if v is None:
                # saved-None field (e.g. ema_params of a non-EMA run):
                # the restore template must carry the None explicitly —
                # omitting the key is a structure mismatch
                tpl[k] = None
                continue
            field = getattr(template, k, None)
            if field is None and k == "ema_params":
                field = template.params       # structural stand-in
            if field is None:
                raise RuntimeError(
                    f"checkpoint {step} carries field {k!r} this "
                    "TrainState has no counterpart for — cannot restore "
                    "(real schema breakage, not optional-field drift); "
                    f"strict-restore error: {first_error}"
                ) from first_error
            tpl[k] = field
        try:
            raw = self._mgr.restore(step, args=ocp.args.StandardRestore(tpl))
        except Exception as flex_err:
            # a second failure means the checkpoint itself is bad (corrupt
            # shard, killed save) — surface the ORIGINAL strict error too
            raise RuntimeError(
                f"checkpoint {step} failed both strict and flexible "
                f"restore; strict error: {first_error}") from flex_err
        ema = raw.get("ema_params")
        if template.ema_params is not None and ema is None:
            ema = raw["params"]
        if template.ema_params is None:
            ema = None                        # this run has EMA off
        merged = {k: v for k, v in raw.items() if k != "ema_params"}
        return template.replace(ema_params=ema, **merged)

    def restore_latest_raw(self) -> Optional[dict]:
        """Template-free restore of the latest step as a raw field dict.

        Tolerant of optional TrainState fields (ema_params on EMA-trained
        runs) that a fixed template would reject — the serving/eval CLIs
        use this to load weights from any run's checkpoints.

        Restores array leaves as HOST numpy: a template-free
        ``StandardRestore()`` would re-apply the shardings recorded at
        save time, which name concrete devices ("Device TPU v5 lite0 was
        not found in jax.local_devices()") — so a TPU-trained checkpoint
        would be unloadable from a CPU process (pruning/quantization
        tooling, off-accelerator conversion). The consumers here put the
        weights wherever they need them anyway.
        """
        step = self.latest_step()
        if step is None:
            return None
        import jax
        import numpy as np
        path = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        raw = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
        if not isinstance(raw, dict):
            raw = {"params": raw.params, "batch_stats": raw.batch_stats,
                   "val_conf": raw.val_conf,
                   "ema_params": getattr(raw, "ema_params", None)}
        return raw

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
