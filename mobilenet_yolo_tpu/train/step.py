"""Jitted train / eval steps (single-device and mesh-sharded).

The reference hot loop (train.py:246-283) does: forward with losses inside
the model, host-side metric reads, backward, AdamW step. Here the whole
step — forward, two-head loss, optional segmentation loss, backward, AdamW
update, BN-stat update, metric reduction — is one XLA program. Under a
``data``-sharded mesh, GSPMD inserts the gradient all-reduce over ICI and
BatchNorm batch statistics are computed globally for free (jnp.mean over a
sharded axis lowers to a collective).

Multiscale training (voc/config.yaml:4-9) is handled by compiling one step
per (H, W) bucket — jit caches on shapes, so this is automatic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mobilenet_yolo_tpu.ops.anchors import scaled_anchors
from mobilenet_yolo_tpu.ops.losses import seg_loss, yolo_head_loss
from mobilenet_yolo_tpu.parallel.mesh import batch_sharding, replicated
from mobilenet_yolo_tpu.train.state import TrainState

HEAD_KEYS = ("out0", "out1")


def _slim_cfg(config: dict) -> tuple[float, str]:
    """(lambda, mode) of the Network Slimming sparsity config — mode
    "prox" (default; preconditioned proximal step, prune.py:
    slim_prox_update) or "loss" (L1 loss term, the measured-to-fail
    baseline kept for the record)."""
    lam = float(config.get("slim_l1") or 0.0)
    mode = str(config.get("slim_mode") or "prox")
    if mode not in ("prox", "loss"):
        raise ValueError(f"slim_mode must be 'prox' or 'loss', got {mode!r}")
    return lam, mode


def _slim_prox(config: dict, new_params, new_opt):
    """Apply the proximal Network-Slimming shrink after an optimizer
    update (no-op unless the config asks for slim_mode prox)."""
    lam, mode = _slim_cfg(config)
    if not lam or mode != "prox":
        return new_params
    from mobilenet_yolo_tpu.prune import slim_prox_update
    # The bias-correction count must be Adam's own (the ScaleByAdamState
    # that carries nu) — inject_hyperparams wraps the chain in a state
    # with a second `count`, so filter to the one sitting next to `nu`.
    adam_count = optax.tree_utils.tree_get(
        new_opt, "count",
        filtering=lambda path, _: getattr(
            path[-1], "tuple_name", None) == "ScaleByAdamState")
    return slim_prox_update(
        new_params,
        optax.tree_utils.tree_get(new_opt, "nu"),
        adam_count,
        new_opt.hyperparams["learning_rate"], lam)


def _mesh_jit(step, mesh, n_data: int, n_trailing_repl: int = 0,
              donate: bool = True):
    """jit a step function over a mesh.

    Args after the state: ``n_data`` batch arrays (sharded over the
    ``data`` axis) then ``n_trailing_repl`` replicated scalars/keys; the
    state itself and all outputs are replicated. Under a tensor-parallel
    mesh (``model`` axis > 1) the state placements set by
    parallel/sharding.py propagate through a plain jit instead.
    """
    kw = {"donate_argnums": (0,)} if donate else {}
    if mesh.shape.get("model", 1) > 1:
        return jax.jit(step, **kw)
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    in_sh = (repl,) + (data,) * n_data + (repl,) * n_trailing_repl
    return jax.jit(step, in_shardings=in_sh, out_shardings=repl, **kw)


def make_loss_fn(model, config: dict, segmentation: bool = False,
                 normalize: bool = False) -> Callable:
    """Pure loss over (params, batch_stats, batch) -> (loss, aux).

    With ``normalize=True`` the step takes RAW [0, 255] images (uint8 or
    float) and applies the config's mean/std on device — the host pipeline
    then ships uint8 (4x less host->device traffic) and skips its two
    float passes per image, the training-path counterpart of the serving
    trick in eval/detector.py.
    """
    yolo_cfg = config["yolo"]
    anchors_px = np.asarray(yolo_cfg["anchors"], np.float32)
    masks = [list(m) for m in yolo_cfg["mask"]]
    ignore_threshs = [float(t) for t in yolo_cfg["ignore_thresh"]]
    iou_thresh = float(yolo_cfg["iou_thresh"])
    iou_weighting = float(config.get("iou_weighting", 0.01))
    num_classes = int(yolo_cfg["num_classes"])
    # Network Slimming sparsity (prune.py). Mode "loss" adds the L1 term
    # here; the default "prox" applies it outside the optimizer in the
    # train steps instead (slim_prox_update documents why loss-mode L1
    # measurably fails under AdamW)
    slim_l1, slim_mode = _slim_cfg(config)
    if slim_mode != "loss":
        slim_l1 = 0.0
    if normalize:
        norm_cfg = config.get("normalize",
                              {"mean": [0.5] * 3, "std": [1.0] * 3})
        norm_mean = np.asarray(norm_cfg["mean"], np.float32)
        norm_std = np.asarray(norm_cfg["std"], np.float32)

    model_dtype = getattr(model, "dtype", None)

    def loss_fn(params, batch_stats, images, gt, n_gt, seg_maps=None, train=True):
        if normalize:
            # uint8 input normalizes in f32 (host-parity numerics). A
            # float input (e.g. the bf16 fused-aug output) keeps its dtype
            # ONLY when the model computes in it anyway; under an f32
            # model the normalize upcasts to f32 so the forward sees f32
            # inputs (the bf16 pixel quantization already happened — this
            # keeps the normalize math and conv inputs at model precision)
            dt = (images.dtype
                  if (jnp.issubdtype(images.dtype, jnp.floating)
                      and model_dtype is not None
                      and jnp.dtype(model_dtype) == images.dtype)
                  else jnp.float32)
            images = (images.astype(dt) / 255.0
                      - norm_mean.astype(dt)) / norm_std.astype(dt)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            outputs, mutated = model.apply(variables, images, train=True,
                                           mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            outputs = model.apply(variables, images, train=False)
            new_stats = batch_stats

        h, w = images.shape[1], images.shape[2]
        anchors_norm = jnp.asarray(scaled_anchors(anchors_px, w, h))

        total = jnp.asarray(0.0, jnp.float32)
        metrics = {}
        # loss numerics stay f32 even under bf16 (mixed-precision) compute
        outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
        for i, (key, mask, ig) in enumerate(zip(HEAD_KEYS, masks, ignore_threshs)):
            hl = yolo_head_loss(
                outputs[key], gt, n_gt, anchors_norm, mask, num_classes,
                ignore_thresh=ig, iou_thresh=iou_thresh,
                iou_weighting=iou_weighting,
            )
            total = total + hl.loss
            for mk, mv in hl.metrics.items():
                metrics[f"{mk}{i}"] = mv

        if segmentation:
            sl, s_obj, s_no_obj = seg_loss(outputs["seg"], seg_maps)
            total = total + sl
            metrics["seg_obj"] = s_obj
            metrics["seg_no_obj"] = s_no_obj
        if slim_l1 and train:
            from mobilenet_yolo_tpu.prune import slim_penalty
            total = total + slim_l1 * slim_penalty(params)
        metrics["loss"] = total
        return total, (new_stats, metrics)

    return loss_fn


def _ema_update(state: TrainState, new_params, new_opt, ema_decay,
                ema_ramp: float = 2000.0):
    """EMA of the params after an optimizer step (None decay = off).

    ``ema = d_t * ema + (1 - d_t) * params`` with the standard warmup ramp
    ``d_t = decay * (1 - exp(-t / ramp))`` over the optimizer step count
    (as in YOLOv5/timm): early in training d_t ~= 0 so the EMA tracks the
    live params instead of dragging the random init along — a constant
    decay measurably cripples early/mid-run eval (a 0.99-decay fabricated
    -VOC run sat at mAP 0.10 @ epoch 30 where the ramped EMA matches the
    live 0.86, docs/TRAINING.md). ``ema_ramp=0`` disables the ramp
    (constant decay; exactness tests). The step count rides in the Adam
    state, so resume keeps the schedule. A trace-time check catches a
    state built without ``create_train_state(ema=True)``.
    """
    if ema_decay is None:
        return state.ema_params
    if state.ema_params is None:
        raise ValueError("ema_decay set but state.ema_params is None — "
                         "build the state with create_train_state(ema=True)")
    d = jnp.float32(ema_decay)
    if ema_ramp:
        # the step count after this update; make_optimizer always wraps
        # with inject_hyperparams, whose state carries it at the top level
        count = getattr(new_opt, "count", None)
        if count is None:
            count = optax.tree_utils.tree_get(new_opt, "count")
        d = d * (1.0 - jnp.exp(-count.astype(jnp.float32)
                               / jnp.float32(ema_ramp)))
    return jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        state.ema_params, new_params)


def make_train_step(
    model,
    config: dict,
    tx: optax.GradientTransformation,
    segmentation: bool = False,
    mesh=None,
    normalize: bool = False,
    pixel_aug: bool = False,
    ema_decay: float | None = None,
    ema_ramp: float = 2000.0,
    donate: bool = True,
) -> Callable:
    """Returns ``train_step(state, images, gt, n_gt[, seg_maps]
    [, jitter_op, jitter_factor]) -> (state, metrics)``, jitted (and
    GSPMD-sharded when a mesh is given).

    ``pixel_aug=True`` (requires ``normalize=True``, i.e. raw uint8 input)
    runs the device-side photometric color jitter inside the step, as the
    host-PLANNED per-image programs the Loader emits (``jitter_op`` /
    ``jitter_factor`` (B, 5) arrays from augment.sample_photometric —
    reference op ORDER included, ops/device_augment.py:
    planned_color_jitter). The host pipeline keeps the imgaug noise trio,
    preserving the reference's op set and noise-before-jitter order.
    """
    if pixel_aug and not normalize:
        raise ValueError("pixel_aug requires normalize=True (raw images)")
    loss_fn = make_loss_fn(model, config, segmentation, normalize=normalize)

    def core(state: TrainState, images, gt, n_gt, seg_maps, jitter_op,
             jitter_factor):
        if pixel_aug:
            # jitter ONLY: the host keeps the full imgaug noise trio
            # (blur/median/sharpen/additive noise) applied BEFORE its
            # geometric transforms, preserving the reference's op set,
            # probabilities and noise-before-jitter order — moving the
            # noise here too would drop the blur family and re-gate the
            # noise at an independent p=0.5
            from mobilenet_yolo_tpu.ops.device_augment import \
                planned_color_jitter
            images = planned_color_jitter(
                images, jitter_op, jitter_factor,
                dtype=getattr(model, "dtype", None) or jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, images, gt, n_gt, seg_maps,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = _slim_prox(config, optax.apply_updates(state.params,
                                                            updates), new_opt)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            ema_params=_ema_update(state, new_params, new_opt, ema_decay,
                                   ema_ramp),
        )
        return new_state, metrics

    # positional signature follows the enabled features: ...[, seg_maps]
    # [, jitter_op, jitter_factor] — no optional-arg aliasing between them
    if segmentation and pixel_aug:
        def step(state, images, gt, n_gt, seg_maps, jitter_op,
                 jitter_factor):
            return core(state, images, gt, n_gt, seg_maps, jitter_op,
                        jitter_factor)
    elif segmentation:
        def step(state, images, gt, n_gt, seg_maps):
            return core(state, images, gt, n_gt, seg_maps, None, None)
    elif pixel_aug:
        def step(state, images, gt, n_gt, jitter_op, jitter_factor):
            return core(state, images, gt, n_gt, None, jitter_op,
                        jitter_factor)
    else:
        def step(state, images, gt, n_gt):
            return core(state, images, gt, n_gt, None, None, None)

    if mesh is not None:
        # the jitter plans are per-image arrays — batch-sharded like the rest
        return _mesh_jit(step, mesh,
                         n_data=3 + int(segmentation) + 2 * int(pixel_aug),
                         donate=donate)
    return jax.jit(step, donate_argnums=(0,)) if donate else jax.jit(step)


GEOMETRY_BATCH_KEYS = ("slots", "src_rect", "dst_rect", "fill_rect",
                       "fill_color", "fill_from_mean", "flip", "active",
                       "noise_gate", "noise_scale", "noise_per_channel",
                       "jitter_op", "jitter_factor")


def make_geometry_train_step(model, config: dict,
                             tx: optax.GradientTransformation,
                             mesh=None, segmentation: bool = False,
                             fused_aug: bool | str | None = None,
                             ema_decay: float | None = None,
                             ema_ramp: float = 2000.0) -> Callable:
    """Train step with the WHOLE augmentation pipeline on device.

    Returns ``step(state, *geom_arrays, gt, n_gt, aug_key, out_hw=(H, W))``
    where ``geom_arrays`` are the GEOMETRY_BATCH_KEYS arrays produced by
    ``Loader(device_geometry=True)`` — plus ``(seg_slots, seg_active)``
    after them when ``segmentation`` is on (the /16 training targets are
    then rasterized on device too, ops/device_augment.py:seg_compose).
    The step composes expand/crop/flip/mosaic from the staged sources
    (geometric_compose), color-jitters each source, normalizes, then runs
    the usual forward/loss/backward/update — one XLA program per output
    size bucket (``out_hw`` selects it; multiscale = a handful of caches,
    exactly like the shape-bucketed plain step).

    ``fused_aug``: run the pixel-aug stages as fused Pallas kernels
    (kernels/pallas_aug.py) instead of ~10 XLA memory passes over the
    slots. ``None`` (default) = auto: on when the backend is TPU;
    ``True`` = the FULL kernel (noise + jitter + geometric compose in
    one program per output image); ``"split"`` = per-slot noise+jitter
    kernel with the XLA compose; ``False`` = always the XLA ops (CPU,
    and the reference implementation the kernels are tested against);
    ``"interpret"`` / ``"interpret-split"`` = the same in interpreter
    mode (CPU tests).
    """
    from mobilenet_yolo_tpu.ops.device_augment import (fused_aug_compose,
                                                       geometric_compose,
                                                       seg_compose,
                                                       slot_noise)

    if fused_aug is None:
        fused_aug = jax.default_backend() == "tpu"
    loss_fn = make_loss_fn(model, config, segmentation=segmentation,
                           normalize=True)
    seg_classes = int(config.get("seg", {}).get("num_classes", 0))
    # the aug stages run in the model's compute dtype: under --bf16 they
    # feed a bf16 forward anyway, and bf16 halves their bandwidth bill
    # (reductions and the hue round-trip stay f32 inside the ops)
    aug_dtype = getattr(model, "dtype", None) or jnp.float32

    def build(out_hw):
        def core(state, slots, src_rect, dst_rect, fill_rect, fill_color,
                 fill_from_mean, flip, active, noise_gate, noise_scale,
                 noise_per_channel, jitter_op, jitter_factor, gt, n_gt,
                 aug_key, seg_slots=None, seg_active=None):
            # noise before jitter: the reference applies the imgaug seq
            # before transform_od's photometric (folder2lmdb.py:131-135);
            # the jitter itself is fully host-planned (op order + factors,
            # data/geometry.py), so aug_key only feeds the noise draw
            if fused_aug:
                # the fused path runs bf16 END-TO-END even under an f32
                # model: staged pixels are uint8-quantized anyway and bf16
                # resolves [0, 255] at ~0.25-0.5 intensity, while halving
                # the aug stages' HBM traffic and doubling VPU throughput;
                # normalize upcasts against the f32 mean/std constants
                images = fused_aug_compose(
                    slots, src_rect, dst_rect, fill_rect, fill_color,
                    fill_from_mean, flip, active, out_hw,
                    noise_gate, noise_scale, noise_per_channel,
                    jitter_op, jitter_factor, aug_key, dtype=jnp.bfloat16,
                    mesh=mesh,
                    interpret=fused_aug in ("interpret", "interpret-split"),
                    full=fused_aug in (True, "interpret"))
            else:
                slots = slot_noise(slots, aug_key, noise_gate, noise_scale,
                                   noise_per_channel, dtype=aug_dtype)
                images = geometric_compose(
                    slots, src_rect, dst_rect, fill_rect, fill_color,
                    fill_from_mean, flip, active, out_hw,
                    jitter_op=jitter_op, jitter_factor=jitter_factor,
                    dtype=aug_dtype)
            seg_maps = None
            if segmentation:
                seg_maps = seg_compose(
                    seg_slots, src_rect, dst_rect, flip, seg_active,
                    (out_hw[0] // 16, out_hw[1] // 16), seg_classes)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, images, gt, n_gt, seg_maps)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = _slim_prox(config, optax.apply_updates(
                state.params, updates), new_opt)
            return state.replace(
                params=new_params, batch_stats=new_stats, opt_state=new_opt,
                ema_params=_ema_update(state, new_params, new_opt,
                                       ema_decay, ema_ramp),
            ), metrics

        if segmentation:
            def step(state, slots, src_rect, dst_rect, fill_rect,
                     fill_color, fill_from_mean, flip, active, noise_gate,
                     noise_scale, noise_per_channel, jitter_op,
                     jitter_factor, seg_slots, seg_active,
                     gt, n_gt, aug_key):
                return core(state, slots, src_rect, dst_rect, fill_rect,
                            fill_color, fill_from_mean, flip, active,
                            noise_gate, noise_scale, noise_per_channel,
                            jitter_op, jitter_factor,
                            gt, n_gt, aug_key, seg_slots, seg_active)
            n_data = 17
        else:
            def step(state, slots, src_rect, dst_rect, fill_rect,
                     fill_color, fill_from_mean, flip, active, noise_gate,
                     noise_scale, noise_per_channel, jitter_op,
                     jitter_factor, gt, n_gt, aug_key):
                return core(state, slots, src_rect, dst_rect, fill_rect,
                            fill_color, fill_from_mean, flip, active,
                            noise_gate, noise_scale, noise_per_channel,
                            jitter_op, jitter_factor, gt, n_gt, aug_key)
            n_data = 15

        if mesh is not None:
            return _mesh_jit(step, mesh, n_data=n_data, n_trailing_repl=1)
        return jax.jit(step, donate_argnums=(0,))

    cache: dict = {}

    def stepper(state, *args, out_hw):
        out_hw = (int(out_hw[0]), int(out_hw[1]))
        fn = cache.get(out_hw)
        if fn is None:
            fn = cache[out_hw] = build(out_hw)
        return fn(state, *args)

    return stepper


def make_eval_step(model, config: dict, segmentation: bool = False,
                   mesh=None) -> Callable:
    """Loss/metric evaluation without parameter updates (running BN stats)."""
    loss_fn = make_loss_fn(model, config, segmentation)

    def step(state: TrainState, images, gt, n_gt, seg_maps=None):
        _, (_, metrics) = loss_fn(state.params, state.batch_stats, images,
                                  gt, n_gt, seg_maps, train=False)
        return metrics

    if mesh is not None:
        return _mesh_jit(step, mesh, n_data=3 + int(segmentation),
                         donate=False)
    return jax.jit(step)
