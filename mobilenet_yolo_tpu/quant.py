"""Post-training int8 quantization (PTQ) for deployment.

The reference's deployment roadmap ships the detector onto the Kneron
KL720 NPU (reference README.md:54 "[x] Porting KL720"), whose toolchain
quantizes weights and activations to int8 offline. This module is that
story rebuilt for this stack: fold BN (models/bn_fold.py), quantize every
conv kernel to per-output-channel symmetric int8, calibrate per-layer
activation ranges on real batches, then *simulate* the int8 graph on
TPU/CPU to measure the mAP cost before committing to an NPU toolchain.

What is quantized:

* **Weights** — every ConvBNAct kernel (backbone, neck, heads' dw/pw
  stacks), per-output-channel symmetric: ``s_c = max|k[...,c]| / 127``,
  ``q = round(k/s)``. Fold BN first so the BN scale lands inside the
  kernel the way deployment graphs ship it.
* **Activations** — every ConvBNAct output (the inter-layer tensors an
  NPU carries in int8), per-tensor symmetric, range = max|x| over the
  calibration set.
* **NOT quantized** — the raw-logit output convs (``HeadStack``'s
  ``out``, models/layers.py:226-230) and the decode/NMS tail: standard
  NPU practice keeps regression/classification heads in higher
  precision, and the reference's KL720 port likewise runs postprocess on
  the host CPU.

Simulation uses ``flax.linen.intercept_methods`` — no model-code changes:
``QuantSim(model, act_scales)`` duck-types the one method
``eval.make_predict_fn`` calls (``.apply``), snapping every ConvBNAct
output onto its calibrated int8 grid, with weights already fake-quantized
into the variables by :func:`fake_quant_variables`. The whole simulated
graph still jits into one XLA program.

CLI: ``tools/quantize.py`` (calibrate → artifact → optional float-vs-int8
mAP A/B via the shared evaluate_detection driver).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from mobilenet_yolo_tpu.models.layers import ConvBNAct


def _is_cba_site(node: Any) -> bool:
    return (isinstance(node, Mapping) and "conv" in node and "bn" in node
            and isinstance(node["conv"], Mapping)
            and "kernel" in node["conv"])


def iter_cba_kernels(params: Mapping, path: tuple = ()):
    """Yield ``(path_tuple, kernel)`` for every ConvBNAct site — a params
    subtree with sibling ``conv``/``bn`` children. Paths match both the
    variables tree and ``flax`` module paths (``context.module.path``), so
    weight tables and activation tables share one key space."""
    for name in sorted(params):
        node = params[name]
        if not isinstance(node, Mapping):
            continue
        if _is_cba_site(node):
            yield path + (name,), node["conv"]["kernel"]
        else:
            yield from iter_cba_kernels(node, path + (name,))


def quantize_weights(params: Mapping):
    """Per-output-channel symmetric int8 of every ConvBNAct kernel.

    Returns ``(qkernels, wscales)`` — flat dicts keyed by '/'-joined site
    path: ``qkernels[site]`` int8 HWIO, ``wscales[site]`` (C,) float32
    with ``kernel ≈ qkernels * wscales``. Zero channels get scale 1 (their
    quantized weights are exactly zero anyway).
    """
    qkernels: dict[str, np.ndarray] = {}
    wscales: dict[str, np.ndarray] = {}
    for path, kernel in iter_cba_kernels(params):
        k = np.asarray(kernel, np.float32)
        absmax = np.max(np.abs(k), axis=(0, 1, 2))
        s = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.rint(k / s), -127, 127).astype(np.int8)
        site = "/".join(path)
        qkernels[site] = q
        wscales[site] = s
    return qkernels, wscales


def _replace_kernels(params: Mapping, table: Mapping[str, np.ndarray],
                     path: tuple = ()) -> dict:
    out: dict = {}
    for name, node in params.items():
        sub = path + (name,)
        if _is_cba_site(node) and "/".join(sub) in table:
            out[name] = {**node,
                         "conv": {**node["conv"],
                                  "kernel": table["/".join(sub)]}}
        elif isinstance(node, Mapping):
            out[name] = _replace_kernels(node, table, sub)
        else:
            out[name] = node
    return out


def fake_quant_variables(variables: Mapping, qkernels: Mapping[str, np.ndarray],
                         wscales: Mapping[str, np.ndarray]) -> dict:
    """Variables tree with every quantized kernel replaced by its int8-grid
    value (``q * s`` in float) — what the simulated int8 forward runs on."""
    deq = {site: (qkernels[site].astype(np.float32) * wscales[site])
           for site in qkernels}
    out = dict(variables)
    out["params"] = _replace_kernels(variables["params"], deq)
    return out


def make_calibration_fn(model):
    """Jittable ``calib(variables, images) -> {site: absmax}`` over every
    ConvBNAct output in one forward. Fold maxima across batches on host,
    then ``act_scales = {site: absmax / 127}``."""

    def calib(variables, images):
        ranges: dict[str, jax.Array] = {}

        def interceptor(next_fun, args, kwargs, context):
            y = next_fun(*args, **kwargs)
            if isinstance(context.module, ConvBNAct) \
                    and context.method_name == "__call__":
                ranges["/".join(context.module.path)] = \
                    jnp.max(jnp.abs(y.astype(jnp.float32)))
            return y

        with nn.intercept_methods(interceptor):
            model.apply(variables, images, train=False)
        return ranges

    return calib


def calibrate_activations(model, variables, batches) -> dict[str, float]:
    """Run the calibration forward over ``batches`` (arrays of identical
    shape jit once; mixed shapes recompile per bucket) and return per-site
    activation scales ``max|x| / 127``."""
    calib = jax.jit(make_calibration_fn(model))
    absmax: dict[str, float] = {}
    for images in batches:
        ranges = jax.device_get(calib(variables, jnp.asarray(images)))
        for site, value in ranges.items():
            absmax[site] = max(absmax.get(site, 0.0), float(value))
    return {site: (v / 127.0 if v > 0 else 1.0)
            for site, v in absmax.items()}


class QuantSim:
    """Duck-typed stand-in for the flax model inside
    ``eval.make_predict_fn`` (which only calls ``.apply``): runs the real
    graph with every calibrated ConvBNAct output snapped to its int8 grid.
    Pair with :func:`fake_quant_variables` so weights are on-grid too —
    together this is bit-faithful to an int8 engine that dequantizes to
    float accumulators (the KL720-class deployment model).
    """

    def __init__(self, model, act_scales: Mapping[str, float]):
        self.model = model
        self.act_scales = {k: float(v) for k, v in act_scales.items()}

    def apply(self, variables, *args, **kwargs):
        scales = self.act_scales

        def interceptor(next_fun, args, kwargs, context):
            y = next_fun(*args, **kwargs)
            if isinstance(context.module, ConvBNAct) \
                    and context.method_name == "__call__":
                s = scales.get("/".join(context.module.path))
                if s is not None:
                    q = jnp.clip(jnp.rint(y.astype(jnp.float32) / s),
                                 -127, 127)
                    y = (q * s).astype(y.dtype)
            return y

        with nn.intercept_methods(interceptor):
            return self.model.apply(variables, *args, **kwargs)


def save_int8(path: str, variables: Mapping, qkernels, wscales,
              act_scales: Mapping[str, float]) -> None:
    """Write the deployment artifact: int8 kernels + weight scales + act
    scales + the float remainder (biases, identity BN, head output convs)
    in tools_io flat-key format."""
    from mobilenet_yolo_tpu.tools_io import _flatten

    flat: dict[str, np.ndarray] = {}
    for site, q in qkernels.items():
        flat[f"wq/{site}"] = q
        flat[f"ws/{site}"] = wscales[site]
    for site, s in act_scales.items():
        # Full float64 precision: the calibration scales are Python floats
        # (max|x|/127 computed in f64) and load_int8 must round-trip them
        # bit-exactly so the loaded QuantSim graph reproduces the saved one.
        flat[f"act/{site}"] = np.float64(s)
    # float remainder: the full tree with quantized kernels zeroed out is
    # redundant — instead store the tree with kernels REPLACED by their
    # dequantized values omitted; simplest faithful form: store everything
    # except the quantized kernels.
    skip = {f"f32/params/{site}/conv/kernel" for site in qkernels}
    remainder = _flatten(variables.get("params", {}), "f32/params/")
    remainder.update(_flatten(variables.get("batch_stats", {}),
                              "f32/batch_stats/"))
    for key, value in remainder.items():
        if key not in skip:
            flat[key] = value
    np.savez(path, **flat)


def load_int8(path: str):
    """Load :func:`save_int8`'s artifact. Returns ``(variables, act_scales)``
    where ``variables`` carries the dequantized (int8-grid) kernels — feed
    both to :class:`QuantSim` to reproduce the simulated int8 graph
    exactly."""
    from mobilenet_yolo_tpu.tools_io import _unflatten

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    qkernels = {k[len("wq/"):]: v for k, v in flat.items()
                if k.startswith("wq/")}
    wscales = {k[len("ws/"):]: v for k, v in flat.items()
               if k.startswith("ws/")}
    act_scales = {k[len("act/"):]: float(v) for k, v in flat.items()
                  if k.startswith("act/")}
    tree = _unflatten({k[len("f32/"):]: v for k, v in flat.items()
                       if k.startswith("f32/")})
    variables = {"params": tree.get("params", {}),
                 "batch_stats": tree.get("batch_stats", {})}
    for site in qkernels:
        node = variables["params"]
        for part in site.split("/"):
            node = node.setdefault(part, {})
        node.setdefault("conv", {})["kernel"] = (
            qkernels[site].astype(np.float32) * wscales[site])
    return variables, act_scales
