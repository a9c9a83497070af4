"""Training loop driver.

The counterpart of reference train.py:45-331 (``main``/``train``/``test``):
epoch loop with the step-decay + warm-up LR schedule, per-batch jitted train
step with running meters, alternate-epoch mAP evaluation with the val_conf
feedback controller, Orbax checkpointing (latest + best), TSV logging,
TensorBoard scalars and HPO report hooks.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobilenet_yolo_tpu.eval.detector import make_predict_fn
from mobilenet_yolo_tpu.parallel.mesh import shard_batch
from mobilenet_yolo_tpu.train.checkpoints import CheckpointManager
from mobilenet_yolo_tpu.train.hpo import NoOpReport, ReportHook
from mobilenet_yolo_tpu.train.schedule import learning_rate_for_epoch
from mobilenet_yolo_tpu.train.state import create_train_state
from mobilenet_yolo_tpu.train.step import (GEOMETRY_BATCH_KEYS,
                                           make_geometry_train_step,
                                           make_train_step)
from mobilenet_yolo_tpu.utils.logger import Logger
from mobilenet_yolo_tpu.utils.meters import MeterDict


class TensorBoardWriter:
    """Scalar writer (reference train.py:49-51,200-217).

    Writes real TF event files through the dependency-free
    ``utils/tb_writer.py`` encoder — no tensorflow import (slow on this
    host) and no silent scalar dropping when TF is absent.
    """

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if logdir:
            from mobilenet_yolo_tpu.utils.tb_writer import EventFileWriter
            self._writer = EventFileWriter(logdir)

    def scalar(self, tag: str, value: float, step: int):
        if self._writer is None:
            return
        self._writer.scalar(tag, float(value), step)
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


@dataclass
class TrainerConfig:
    epochs: int = 300
    learning_rate: float = 7e-4
    weight_decay: float = 4e-4
    schedule: tuple = (100, 170, 240)
    warm_up: tuple = ()
    checkpoint_dir: str = "checkpoint"
    eval_every: int = 2            # odd epochs evaluate (train.py:189,203)
    log_suffix_every: int = 10
    # mid-epoch checkpoint cadence in batches (0 = per-epoch only, the
    # reference's granularity). When on, checkpoints carry (epoch,
    # batch_idx) and resume fast-forwards the Loader to the exact batch;
    # step ids become epoch*1e6+batch so they stay monotonic.
    checkpoint_every_batches: int = 0
    tensorboard_dir: Optional[str] = None
    max_gt: int = 90
    # NMS top-K horizon for evaluation. The reference's ragged pipeline has
    # no cap (utils/box.py:11-31); early-training eval at the val_conf floor
    # (0.01) passes many hundreds of candidates per image, and clipping them
    # skews both mAP and the controller's pred-box count. 512 covers the
    # post-gate candidate count in practice; override via model yaml
    # ``nms_top_k`` for very dense scenes.
    nms_top_k: int = 512
    # exponential-moving-average decay for the eval weights (0 = off, the
    # reference's behavior; 0.999-0.9999 typical). When on, the train step
    # maintains ema_params and evaluation/best-model selection use them
    # (train/state.py). Beyond-reference training stabilizer.
    ema_decay: float = 0.0
    # capture a jax.profiler device trace of this many train steps (after
    # the compile step) into <tensorboard_dir or checkpoint_dir>/profile,
    # loadable in TensorBoard's profile plugin / Perfetto. 0 = off.
    profile_steps: int = 0


class Trainer:
    def __init__(self, model, model_cfg: dict, classes_name: list[str],
                 cfg: TrainerConfig, segmentation: bool = False, mesh=None,
                 report: ReportHook | None = None, verbose: bool = True,
                 device_normalize: bool = False,
                 device_pixel_aug: bool = False,
                 device_geometry: bool = False):
        # device_normalize: loaders emit raw [0,255] uint8 batches
        # (Loader(output_uint8=True)) and the jitted step/predict apply the
        # config's mean/std on device — less host work and 4x less
        # host->device transfer
        # device_pixel_aug: additionally run the photometric color jitter
        # on device in host-planned per-image op order
        # (ops/device_augment.py:planned_color_jitter, programs emitted by
        # Loader._collate); pair with a host dataset built with
        # apply_photometric=False (the imgaug noise trio stays host-side,
        # keeping the reference's op set and noise-before-jitter order)
        self.model = model
        self.model_cfg = model_cfg
        self.classes_name = classes_name
        self.cfg = cfg
        self.segmentation = segmentation
        self.mesh = mesh
        self.report = report or NoOpReport()
        # host-side observability (prints, TSV log, TB events) comes from
        # process 0 only under multi-host — metrics are identical on every
        # process by construction (lockstep eval), so N copies would just
        # interleave garbled output / clobber each other's files
        self._primary = jax.process_index() == 0
        self.verbose = verbose and self._primary

        img_size = (int(model_cfg["img_w"]), int(model_cfg["img_h"]))
        self.state, self.tx = create_train_state(
            model, jax.random.PRNGKey(0), img_size,
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay,
            ema=cfg.ema_decay > 0)
        self._ema_decay = cfg.ema_decay if cfg.ema_decay > 0 else None
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # tensor parallelism: shard large output-channel kernels (and
            # their Adam moments) over the ``model`` axis; the plain-jitted
            # steps then propagate the placements through GSPMD
            from mobilenet_yolo_tpu.parallel.sharding import \
                shard_over_model_axis
            self.state = shard_over_model_axis(self.state, mesh)
        elif mesh is not None and jax.process_count() > 1:
            # multi-host: the freshly-initialized state leaves are process-
            # local single-device arrays (init runs identically on every
            # host); replicate them onto the global mesh so every consumer
            # — the jitted steps, and especially Orbax, which refuses to
            # serialize host-local arrays in a multi-process job — sees
            # pod-global arrays
            from mobilenet_yolo_tpu.parallel.sharding import replicate
            self.state = replicate(self.state, mesh)
        self.device_pixel_aug = device_pixel_aug
        # device_geometry: batches arrive as staged sources + compose
        # parameters (Loader(device_geometry=True)); the step runs the whole
        # augmentation pipeline on device (make_geometry_train_step)
        self.device_geometry = device_geometry
        if device_geometry:
            self.train_step = make_geometry_train_step(
                model, model_cfg, self.tx, mesh=mesh,
                segmentation=segmentation, ema_decay=self._ema_decay)
        else:
            self.train_step = make_train_step(
                model, model_cfg, self.tx, segmentation=segmentation,
                mesh=mesh, normalize=device_normalize,
                pixel_aug=device_pixel_aug, ema_decay=self._ema_decay)
        self._aug_key = jax.random.PRNGKey(17)
        # eval rides the same mesh as training (batch sharded over the
        # ``data`` axis) so the alternate-epoch mAP pass scales with the
        # chip count instead of serializing on one device. Multi-host runs
        # use the SAME sharded predict: the eval loader yields identical
        # host-complete batches on every process (shuffle=False), each
        # host's devices pull just their rows (parallel.mesh.global_batch)
        # and the replicated detections are readable everywhere — eval
        # costs 1x device time pod-wide with metrics/val_conf in lockstep.
        self.predict = make_predict_fn(model, model_cfg, top_k=cfg.nms_top_k,
                                       normalize=device_normalize,
                                       mesh=mesh)
        self._eval_pad_multiple = (mesh.shape.get("data", 1)
                                   if mesh is not None else 1)
        self.ckpt = CheckpointManager(cfg.checkpoint_dir)
        self.tb = TensorBoardWriter(cfg.tensorboard_dir
                                    if self._primary else None)
        self.logger = None
        self.best_acc = 0.0
        self._profiled = False
        self._trace_open = False

    def _profile_dir(self) -> str:
        import os
        return os.path.join(self.cfg.tensorboard_dir
                            or self.cfg.checkpoint_dir, "profile")

    # ------------------------------------------------------------- resume --
    def maybe_resume(self) -> bool:
        # flexible: survives TrainState schema drift (pre-ema_params
        # checkpoints, --ema-decay toggled between save and resume)
        restored = self.ckpt.restore_latest_flexible(self.state)
        if restored is None:
            return False
        self.state = restored
        self.best_acc = float(restored.best_acc)
        b = int(restored.batch_idx)
        self._log(f"resumed from epoch {int(restored.epoch)}"
                  + (f" batch {b}" if b else ""))
        return True

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def _scalar(self, value, dtype):
        """Scalar for a TrainState.replace(...) splice. Multi-host jobs
        need pod-GLOBAL (replicated) arrays — a plain jnp scalar is a
        host-local single-device array that Orbax refuses to serialize in
        a multi-process job (and that would degrade the otherwise-global
        state tree the jitted steps consume)."""
        if self.mesh is not None and jax.process_count() > 1:
            from mobilenet_yolo_tpu.parallel.mesh import global_batch
            return global_batch(self.mesh, np.asarray(value, dtype))
        return jnp.asarray(value, dtype)

    def _ckpt_step(self, epoch: int, batch_idx: int = 0) -> int:
        """Monotonic orbax step id. Plain epoch numbering unless mid-epoch
        checkpointing is on (then epoch*1e6+batch keeps saves ordered)."""
        if self.cfg.checkpoint_every_batches:
            return epoch * 1_000_000 + batch_idx
        return epoch

    # -------------------------------------------------------------- train --
    def train_epoch(self, loader: Iterable, epoch: int,
                    start_batch: int = 0) -> dict:
        from mobilenet_yolo_tpu.parallel.mesh import sync_processes

        # bound inter-rank skew entering the epoch's first collective
        # (new multiscale buckets compile new programs → new gloo cliques
        # with a ~30s rendezvous deadline; see mesh.py:sync_processes)
        sync_processes("pre_epoch")
        lr = learning_rate_for_epoch(self.cfg.learning_rate, epoch,
                                     self.cfg.schedule, self.cfg.warm_up)
        self.state = self.state.with_lr(lr)
        # keep the Loader's plan in lockstep with the training epoch so a
        # resumed run sees the SAME shuffle/augmentation plan the
        # uninterrupted run would (plain iteration counting would restart
        # a resumed run's plans at epoch 1)
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        if start_batch:
            if hasattr(loader, "set_skip"):
                loader.set_skip(start_batch)   # skipped without decoding
            else:
                import itertools
                loader = itertools.islice(iter(loader), start_batch, None)
            self._log(f"  resuming epoch {epoch} at batch {start_batch}")
        meters = MeterDict()
        start = time.time()
        # one-shot device trace: let batches 0-1 compile and warm up, then
        # capture the next profile_steps steps (the trace starts after
        # blocking on batch 1 and stops after blocking on the last traced
        # step, so whole device executions land inside the capture)
        profile_at = (1 if (self.cfg.profile_steps and not self._profiled
                            and start_batch == 0) else None)

        # Metrics are consumed one batch late: materializing them (a host
        # scalar fetch) immediately after dispatch would sync on every
        # step and serialize the next batch's host->device transfer behind
        # the current step's compute. The one-batch delay keeps the
        # dispatch queue one deep (reads still fire the NaN tripwire, one
        # batch late).
        pending: tuple | None = None

        def drain(p):
            j, p_bs, p_metrics = p
            loss_val = float(p_metrics["loss"])
            if not np.isfinite(loss_val):
                # NaN tripwire (reference yolo_loss.py:231-232)
                self._log(f"WARNING: non-finite loss {loss_val} at "
                          f"epoch {epoch} batch {j}")
            meters.update({k: float(v) for k, v in p_metrics.items()}, p_bs)
            if self.verbose and j % self.cfg.log_suffix_every == 0:
                a = meters.averages()
                self._log(
                    f"  e{epoch} b{j}: loss {a.get('loss', 0):.4f} "
                    f"iou {(a.get('avg_iou0', 0) + a.get('avg_iou1', 0)) / 2:.3f} "
                    f"obj {(a.get('obj0', 0) + a.get('obj1', 0)) / 2:.3f} "
                    f"recall {(a.get('recall0', 0) + a.get('recall1', 0)) / 2:.3f}")

        for j, batch in enumerate(loader):
            i = start_batch + j    # absolute batch index within the epoch
            if self.device_geometry:
                args = tuple(jnp.asarray(batch[k])
                             for k in GEOMETRY_BATCH_KEYS)
                if self.segmentation:
                    args += (jnp.asarray(batch["seg_slots"]),
                             jnp.asarray(batch["seg_active"]))
                args += (jnp.asarray(batch["gt"]),
                         jnp.asarray(batch["n_gt"]))
                if self.mesh is not None:
                    args = shard_batch(self.mesh, args)
                key = jax.random.fold_in(self._aug_key, epoch * 100003 + i)
                self.state, metrics = self.train_step(
                    self.state, *args, key, out_hw=batch["out_size"])
            else:
                args = (jnp.asarray(batch["images"]),
                        jnp.asarray(batch["gt"]),
                        jnp.asarray(batch["n_gt"]))
                seg = (jnp.asarray(batch["seg_maps"]),) \
                    if self.segmentation else ()
                jit_plan = ()
                if self.device_pixel_aug:
                    # host-planned per-image photometric programs (op order
                    # + factors), applied on device in planned order
                    if "jitter_op" not in batch:
                        raise ValueError(
                            "device_pixel_aug=True but the batch carries "
                            "no jitter plans — build the dataset with "
                            "apply_photometric=False so the Loader emits "
                            "them (cli/train.py wires this; see "
                            "Loader._collate)")
                    jit_plan = (jnp.asarray(batch["jitter_op"]),
                                jnp.asarray(batch["jitter_factor"]))
                elif "jitter_op" in batch:
                    raise ValueError(
                        "batch carries host-planned jitter programs but "
                        "device_pixel_aug=False — the photometric "
                        "augmentation would be silently dropped; pass "
                        "device_pixel_aug=True (or rebuild the dataset "
                        "with apply_photometric=True)")
                if self.mesh is not None:
                    args = shard_batch(self.mesh, args)
                    seg = shard_batch(self.mesh, seg)
                    jit_plan = shard_batch(self.mesh, jit_plan)
                self.state, metrics = self.train_step(self.state, *args,
                                                      *seg, *jit_plan)
            if profile_at is not None:
                if j == profile_at:
                    jax.block_until_ready(metrics)  # batch 0 fully done
                    jax.profiler.start_trace(self._profile_dir())
                    self._trace_open = True
                if j == profile_at + self.cfg.profile_steps:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    self._trace_open = False
                    self._profiled = True
                    profile_at = None
                    self._log(f"  wrote {self.cfg.profile_steps}-step "
                              f"device trace to {self._profile_dir()}")
            if pending is not None:
                drain(pending)
            pending = (i, batch["gt"].shape[0], metrics)
            every = self.cfg.checkpoint_every_batches
            if every and (i + 1) % every == 0:
                # mid-epoch snapshot: (epoch, batch_idx) ride the state so
                # a killed run resumes at exactly this batch
                self.state = self.state.replace(
                    batch_idx=self._scalar(i + 1, jnp.int32))
                self.ckpt.save(self._ckpt_step(epoch, i + 1), self.state)
        if pending is not None:
            drain(pending)
        if self._trace_open:
            # profile_steps >= the epoch's remaining batches: the in-loop
            # stop never fired — close the (shorter) trace here rather
            # than leaving it open (a second start_trace would raise)
            jax.profiler.stop_trace()
            self._trace_open = False
            self._profiled = True
            self._log(f"  wrote device trace (shorter than the requested "
                      f"{self.cfg.profile_steps} steps — epoch ended) to "
                      f"{self._profile_dir()}")
        avgs = meters.averages()
        avgs["lr"] = lr
        avgs["epoch_time"] = time.time() - start
        return avgs

    # --------------------------------------------------------------- eval --
    def evaluate(self, loader: Iterable, batch_size: int | None = None
                 ) -> tuple[float, dict]:
        from mobilenet_yolo_tpu.eval.evaluator import evaluate_detection
        from mobilenet_yolo_tpu.parallel.mesh import sync_processes

        # re-sync ranks before the eval program's first (newly-shaped)
        # collective: its gloo clique rendezvous has a hard ~30s deadline
        # that per-process compile skew can otherwise blow (mesh.py)
        sync_processes("pre_eval")

        # with EMA on, evaluate (and thereby select/save the best model
        # with) the averaged weights; BN stats are already a running
        # average, so the live ones pair with them (train/state.py)
        eval_params = (self.state.ema_params
                       if self.state.ema_params is not None
                       else self.state.params)
        variables = {"params": eval_params,
                     "batch_stats": self.state.batch_stats}
        # Multi-host rides the same mesh-sharded predict as single-host
        # multi-chip: the state's (pod-global) params feed the jit
        # directly — DP-replicated AND model-axis (tensor-parallel)
        # placements both propagate (eval/detector.py pins only the
        # outputs replicated under TP) — and evaluate_detection places
        # each host-complete eval batch via global_batch, so the forward
        # costs 1x device time pod-wide and every host computes identical
        # metrics/val_conf from the replicated detections.
        res = evaluate_detection(
            self.predict, variables, loader, self.classes_name,
            float(self.state.val_conf),
            pad_multiple=self._eval_pad_multiple, batch_size=batch_size,
            log=self._log if self.verbose else None,
            mesh=self.mesh if jax.process_count() > 1 else None)
        self.state = self.state.replace(
            val_conf=self._scalar(res["new_conf"], jnp.float32))
        return res["mAP"], res["aps"]

    # ---------------------------------------------------------------- fit --
    def fit(self, train_loader_fn: Callable[[], Iterable],
            eval_loader_fn: Callable[[], Iterable],
            start_epoch: int | None = None) -> float:
        cfg = self.cfg
        if self.logger is None and self._primary:
            path = os.path.join(cfg.checkpoint_dir, "log.txt")
            resume = os.path.isfile(path) and start_epoch != 0
            self.logger = Logger(path, title="training-process", resume=resume)
            self.logger.set_names(["Epoch", "Loss", "Precision", "Time",
                                   "IOU", "LearningRate"])
        first = int(self.state.epoch) if start_epoch is None else start_epoch
        # mid-epoch resume: the restored state says how many batches of
        # epoch `first` were already consumed (0 on epoch boundaries)
        start_batch = int(self.state.batch_idx) if start_epoch is None else 0
        test_acc = self.best_acc  # carried over a resume until the next eval
        for epoch in range(first, cfg.epochs):
            st = time.time()
            stats = self.train_epoch(train_loader_fn(), epoch,
                                     start_batch=start_batch)
            start_batch = 0
            self.tb.scalar("Loss/train", stats.get("loss", 0.0), epoch)
            iou = (stats.get("avg_iou0", 0) + stats.get("avg_iou1", 0)) / 2
            self.tb.scalar("iou/train", iou, epoch)

            self.state = self.state.replace(
                epoch=self._scalar(epoch + 1, jnp.int32),
                batch_idx=self._scalar(0, jnp.int32))
            evaluate_now = (epoch % cfg.eval_every) == (cfg.eval_every - 1)
            if evaluate_now:
                test_acc, _ = self.evaluate(eval_loader_fn())
                self.report.intermediate(test_acc)
                self.best_acc = max(test_acc, self.best_acc)
                self.state = self.state.replace(
                    best_acc=self._scalar(self.best_acc, jnp.float32))
                self.tb.scalar("Accuracy/test", test_acc, epoch + 1)
                self.ckpt.save(self._ckpt_step(epoch + 1), self.state,
                               mAP=test_acc)
            else:
                self.ckpt.save(self._ckpt_step(epoch + 1), self.state)
            if self.logger:
                self.logger.append([epoch + 1, stats.get("loss", 0.0),
                                    test_acc, time.time() - st, iou,
                                    stats["lr"]])
        self.report.final(self.best_acc)
        self.ckpt.close()
        self.tb.close()
        if self.logger:
            self.logger.close()
        return self.best_acc
