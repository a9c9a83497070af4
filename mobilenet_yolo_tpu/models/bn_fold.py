"""BatchNorm folding for inference.

Folds every conv+BN pair (any module holding sibling ``conv`` and ``bn``
children, i.e. every :class:`ConvBNAct`) into the conv kernel:

    kernel' = kernel * gamma / sqrt(var + eps)   (per output channel)
    bias'   = beta - mean * gamma / sqrt(var + eps)

and rewrites the BN variables to exact identity (scale=1, bias=bias',
mean=0, var=1-eps), so the folded tree runs through the *unchanged* model
code with bit-identical eval outputs but no per-channel normalisation math
or BN parameter traffic. This is the TPU counterpart of the usual
inference-graph BN folding the reference leaves to deployment tooling.
"""

from __future__ import annotations

import jax.numpy as jnp

from mobilenet_yolo_tpu.models.layers import BN_EPS


def _fold_tree(params: dict, stats: dict) -> tuple[dict, dict]:
    new_params: dict = {}
    new_stats: dict = {}
    keys = set(params) | set(stats)
    for key in keys:
        p = params.get(key)
        s = stats.get(key)
        if key == "bn" and isinstance(p, dict) and isinstance(s, dict) \
                and "conv" in params and "kernel" in params["conv"]:
            continue  # handled together with 'conv' below
        if key == "conv" and isinstance(p, dict) and "kernel" in p \
                and "bn" in params:
            bn_p = params["bn"]
            bn_s = stats["bn"]
            rstd = 1.0 / jnp.sqrt(bn_s["var"] + BN_EPS)
            factor = bn_p["scale"] * rstd                       # (C,)
            kernel = p["kernel"] * factor                        # HWIO: out=C last
            bias = bn_p["bias"] - bn_s["mean"] * factor
            new_params["conv"] = {**p, "kernel": kernel}
            new_params["bn"] = {"scale": jnp.ones_like(bn_p["scale"]),
                                "bias": bias}
            new_stats["bn"] = {"mean": jnp.zeros_like(bn_s["mean"]),
                               "var": jnp.full_like(bn_s["var"], 1.0 - BN_EPS)}
            continue
        if isinstance(p, dict) or isinstance(s, dict):
            sub_p, sub_s = _fold_tree(p or {}, s or {})
            if sub_p:
                new_params[key] = sub_p
            if sub_s:
                new_stats[key] = sub_s
        else:
            if p is not None:
                new_params[key] = p
            if s is not None:
                new_stats[key] = s
    return new_params, new_stats


def fold_batchnorm(variables: dict) -> dict:
    """Returns a new ``{'params', 'batch_stats'}`` tree with BN folded."""
    params, stats = _fold_tree(dict(variables["params"]),
                               dict(variables.get("batch_stats", {})))
    return {"params": params, "batch_stats": stats}
