"""Structured channel pruning (Network Slimming) for the YOLO models.

Implements the reference's unchecked roadmap item (reference README.md:56
"Under construction: Pruning") the standard way for inverted-residual
nets — Liu et al. 2017 "Learning Efficient Convolutional Networks through
Network Slimming": BatchNorm scale factors (gamma) act as per-channel
gates; train with an L1 penalty on them (``slim_l1`` in the model config /
``--slim-l1`` on cli/train.py), then remove the channels whose |gamma|
falls below a global threshold and fine-tune.

What is pruned (each set has exactly ONE producer and in-block consumers,
so slicing is local and the rest of the graph is untouched):

* the **expansion (hidden) channels** of every backbone block with an
  expand conv — MBv2 InvertedResidual (``expand_ratio != 1``) and MBv3
  bneck alike: expand-conv output, its BN, the depthwise conv, its BN,
  and the project-conv input.  These expansions carry most of the
  backbone's MACs.  (MBv3's SE module gates the *project* output, so it
  is untouched by a hidden-channel cut.)
* the **backbone head-conv output** (1280 ch on MBv2, 960 on MBv3-MACC)
  — its BN and the detector's ``conv_for_S32`` input — but ONLY when
  that consumer is a plain 1x1 ConvBNAct.  MBv3YOLO's consumer is a
  DepthwiseConvolution whose internal widths are input-coupled, so the
  head stays unpruned there (detected structurally, never by name).

Block *output* channels are NOT pruned: they are coupled across residual
adds and the pretrained weights; hidden-channel pruning is the standard
safe cut for MobileNets.

TPU note: kept counts are rounded UP to a multiple of ``round_to``
(default 8; use 128 to stay lane-aligned) by re-admitting the
highest-|gamma| pruned channels — XLA pads vector lanes anyway, so odd
widths waste the cut.

Library API (tools/prune.py is the CLI):

* :func:`prunable_gammas` — {site: |gamma| vector} over the prunable BNs
* :func:`plan_prune`      — global-threshold keep plan
* :func:`apply_prune`     — slice params/batch_stats, emit the model-yaml
                            ``prune:`` block for :func:`models.build_model`
* :func:`slim_penalty`    — sum |gamma| over prunable BNs (the training
                            L1 term; wired in train/step.py:make_loss_fn)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

_HEAD_SITE = "head_conv"


def _block_sites(backbone_params: Mapping[str, Any]) -> list[str]:
    """Backbone blocks with an expand conv (prunable hidden channels), in
    definition order: MBv2 ``block{i}`` (block0 has expand_ratio 1, no
    expand conv — skipped automatically), MBv3 ``bneck{i}`` then
    ``bneck2_{i}``."""

    def order(name: str) -> tuple[int, int]:
        for prefix, stage in (("bneck2_", 1), ("bneck", 0), ("block", 0)):
            if name.startswith(prefix):
                return (stage, int(name[len(prefix):]))
        raise KeyError(name)

    names = [n for n in backbone_params
             if n.startswith(("block", "bneck"))
             and "expand" in backbone_params[n]]
    return sorted(names, key=order)


def _head_prunable(params: Mapping[str, Any]) -> bool:
    """The backbone head conv is prunable only when its consumer is a
    plain 1x1 ConvBNAct (MBv2YOLO / MBv3YOLOMacc ``conv_for_S32``) whose
    input slice is trivial — not MBv3YOLO's width-coupled
    DepthwiseConvolution."""
    return (_HEAD_SITE in params.get("backbone", {})
            and "conv" in params.get("conv_for_S32", {}))


def prunable_gammas(params: Mapping[str, Any],
                    include_head: bool = True) -> dict[str, np.ndarray]:
    """|gamma| per prunable site.

    The gate for a hidden channel is the expand conv's BN scale — the
    first (and, through the monotone activation + depthwise chain,
    dominant) multiplicative factor on everything the channel contributes.
    """
    backbone = params["backbone"]
    gammas = {}
    for name in _block_sites(backbone):
        gammas[name] = np.abs(
            np.asarray(backbone[name]["expand"]["bn"]["scale"]))
    if include_head and _head_prunable(params):
        gammas[_HEAD_SITE] = np.abs(
            np.asarray(backbone[_HEAD_SITE]["bn"]["scale"]))
    return gammas


def plan_prune(params: Mapping[str, Any], ratio: float,
               min_keep: int = 8, round_to: int = 8,
               include_head: bool = True) -> dict[str, np.ndarray]:
    """Keep plan: site -> sorted kept-channel indices.

    ``ratio`` is the global fraction of prunable channels to remove; the
    threshold is the ratio-quantile of ALL prunable |gamma| pooled
    (Network Slimming's global criterion), then per site the kept count
    is floored at ``min_keep`` and rounded up to ``round_to`` by
    re-admitting the largest-|gamma| pruned channels.
    """
    if not 0.0 <= ratio < 1.0:
        raise ValueError(f"prune ratio must be in [0, 1), got {ratio}")
    gammas = prunable_gammas(params, include_head=include_head)
    pooled = np.sort(np.concatenate(list(gammas.values())))
    cut = int(ratio * pooled.size)
    threshold = -np.inf if cut == 0 else pooled[cut - 1]

    keep: dict[str, np.ndarray] = {}
    for site, g in gammas.items():
        n_keep = int(np.sum(g > threshold))
        n_keep = max(n_keep, min(min_keep, g.size))
        n_keep = min(-(-n_keep // round_to) * round_to, g.size)
        # stable top-k by |gamma|: ties broken by channel index
        order = np.argsort(-g, kind="stable")
        keep[site] = np.sort(order[:n_keep])
    return keep


def _slice_bn(site_params, site_stats, idx):
    for k in ("scale", "bias"):
        site_params["bn"][k] = np.asarray(site_params["bn"][k])[idx]
    for k in ("mean", "var"):
        site_stats["bn"][k] = np.asarray(site_stats["bn"][k])[idx]


def _hidden_slot(site: str, backbone_params: Mapping[str, Any]) -> int:
    """Index of ``site`` in the model's ``backbone_hidden`` tuple."""
    if site.startswith("block"):          # MBv2: slot == block index
        return int(site[len("block"):])
    if site.startswith("bneck2_"):        # MBv3 stage2 after stage1
        n_stage1 = len([n for n in backbone_params
                        if n.startswith("bneck")
                        and not n.startswith("bneck2_")])
        return n_stage1 + int(site[len("bneck2_"):])
    return int(site[len("bneck"):])


def apply_prune(params, batch_stats, keep: Mapping[str, np.ndarray]
                ) -> tuple[dict, dict, dict]:
    """Slice the variable trees along the keep plan.

    Returns ``(params, batch_stats, prune_cfg)`` where ``prune_cfg`` is
    the model-yaml ``prune:`` block (``backbone_hidden`` per-block widths
    with None for non-prunable blocks, ``backbone_head``) that
    :func:`models.build_model` consumes to rebuild the slim graph.
    """
    import jax
    # tree.map rebuilds the dict containers, so in-place edits below are
    # safe (the caller's tree is untouched)
    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    backbone_p = params["backbone"]
    backbone_s = batch_stats["backbone"]

    n_blocks = len([n for n in backbone_p if n.startswith(("block", "bneck"))])
    hidden: list[int | None] = [None] * n_blocks

    for site, idx in keep.items():
        idx = np.asarray(idx)
        if site == _HEAD_SITE:
            if not _head_prunable(params):
                raise ValueError(
                    "head_conv is not prunable for this graph (its "
                    "consumer is not a plain 1x1 conv)")
            hc_p, hc_s = backbone_p[_HEAD_SITE], backbone_s[_HEAD_SITE]
            hc_p["conv"]["kernel"] = np.asarray(
                hc_p["conv"]["kernel"])[..., idx]
            _slice_bn(hc_p, hc_s, idx)
            # the one consumer: detector conv_for_S32 input channels
            c32 = params["conv_for_S32"]["conv"]
            c32["kernel"] = np.asarray(c32["kernel"])[:, :, idx, :]
            continue
        bp, bs = backbone_p[site], backbone_s[site]
        bp["expand"]["conv"]["kernel"] = np.asarray(
            bp["expand"]["conv"]["kernel"])[..., idx]
        _slice_bn(bp["expand"], bs["expand"], idx)
        # depthwise kernel is (k, k, 1, hidden)
        bp["depthwise"]["conv"]["kernel"] = np.asarray(
            bp["depthwise"]["conv"]["kernel"])[..., idx]
        _slice_bn(bp["depthwise"], bs["depthwise"], idx)
        bp["project"]["conv"]["kernel"] = np.asarray(
            bp["project"]["conv"]["kernel"])[:, :, idx, :]
        hidden[_hidden_slot(site, backbone_p)] = int(idx.size)

    prune_cfg: dict[str, Any] = {"backbone_hidden": hidden}
    if _HEAD_SITE in keep:
        prune_cfg["backbone_head"] = int(np.asarray(keep[_HEAD_SITE]).size)
    return params, batch_stats, prune_cfg


def slim_penalty(params) -> Any:
    """Sum of |gamma| over the prunable BNs (jit-traceable).

    The Network Slimming sparsity term as a LOSS term
    (``slim_mode: loss``): the trainer adds ``config["slim_l1"] *
    slim_penalty(params)`` to the loss. **Measured to fail under AdamW**
    (the reference recipe's optimizer, train.py:134): Adam normalizes the
    constant ``lam * sign(gamma)`` penalty gradient by its own second
    moment, so every gamma shrinks at the SAME ~lr/step rate regardless
    of how useful its channel is — a 60-epoch fabricated-VOC run left all
    8384 prunable gammas in a uniform 0.75 +/- 0.01 band (bottom-30%
    |gamma| mass = 29.7% ~= the cut ratio, i.e. zero concentration) and
    the 30% cut collapsed mAP 0.927 -> 0.169 before fine-tuning
    (docs/TRAINING.md §7). Kept for the record; train with
    :func:`slim_prox_update` (``slim_mode: prox``, the default) instead.
    """
    import jax.numpy as jnp
    backbone = params["backbone"]
    total = jnp.asarray(0.0, jnp.float32)
    for name in _block_sites(backbone):
        total = total + jnp.sum(
            jnp.abs(backbone[name]["expand"]["bn"]["scale"]))
    if _head_prunable(params):
        total = total + jnp.sum(
            jnp.abs(backbone[_HEAD_SITE]["bn"]["scale"]))
    return total


def slim_prox_update(params, nu, count, lr, lam: float,
                     b2: float = 0.999, eps: float = 1e-8):
    """Preconditioned proximal L1 step on the prunable gammas (jit-safe).

    Network Slimming's sparsity pressure, applied OUTSIDE the optimizer as
    a soft-threshold in Adam's own preconditioned metric — the fix for the
    measured loss-term failure documented at :func:`slim_penalty`::

        gamma <- sign(gamma) * max(|gamma| - lr * lam / (sqrt(v_hat) + eps), 0)

    where ``v_hat`` is the gamma's bias-corrected Adam second moment
    (``nu / (1 - b2**count)``). The shrink and Adam's data-driven restore
    ``lr * m_hat / (sqrt(v_hat) + eps)`` share the preconditioner, so they
    cancel: a channel survives iff its MEAN data-gradient magnitude on
    gamma exceeds ``lam`` — exactly the plain-SGD Network Slimming
    criterion (Liu et al. 2017 trained with SGD, where the lam-vs-gradient
    competition is magnitude-based), restored under AdamW. Dead channels
    (noise-only gradient, tiny ``v_hat``) get a large threshold and are
    driven to exactly 0 within a few steps; they can still revive — the
    gamma gradient ``sum(delta * x_hat)`` flows at gamma == 0.

    Called by the train steps after ``optax.apply_updates`` when the model
    config carries ``slim_l1`` with ``slim_mode: prox`` (the default mode,
    cli/train.py ``--slim-l1/--slim-mode``). ``nu``/``count`` come from
    the post-update optimizer state; ``lr`` from the injected
    hyperparams. Returns a new params tree (touched paths rebuilt).
    """
    import jax.numpy as jnp

    bias_corr = 1.0 - jnp.power(jnp.float32(b2), count.astype(jnp.float32))

    def soft(gamma, nu_gamma):
        thr = lr * lam / (jnp.sqrt(nu_gamma / bias_corr) + eps)
        return jnp.sign(gamma) * jnp.maximum(jnp.abs(gamma) - thr, 0.0)

    params = dict(params)
    backbone = dict(params["backbone"])
    nu_backbone = nu["backbone"]
    for name in _block_sites(backbone):
        site = dict(backbone[name])
        expand = dict(site["expand"])
        bn = dict(expand["bn"])
        bn["scale"] = soft(bn["scale"],
                           nu_backbone[name]["expand"]["bn"]["scale"])
        expand["bn"] = bn
        site["expand"] = expand
        backbone[name] = site
    if _head_prunable(params):
        site = dict(backbone[_HEAD_SITE])
        bn = dict(site["bn"])
        bn["scale"] = soft(bn["scale"],
                           nu_backbone[_HEAD_SITE]["bn"]["scale"])
        site["bn"] = bn
        backbone[_HEAD_SITE] = site
    params["backbone"] = backbone
    return params


def param_count(tree) -> int:
    import jax
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))
