"""Flat .npz (de)serialization of flax variable trees.

The interchange format for the torch->JAX weight converter
(tools/convert_torch.py) and for ``--init-from`` warm starts: parameters
and batch stats flattened by '/'-joined path.
"""

from __future__ import annotations

import numpy as np
import jax


def _flatten(tree, prefix: str) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params_npz(path: str, params, batch_stats) -> None:
    flat = _flatten(params, "params/")
    flat.update(_flatten(batch_stats, "batch_stats/"))
    np.savez(path, **flat)


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def load_params_npz(path: str):
    """Returns (params, batch_stats) nested dicts of numpy arrays."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    return tree.get("params", {}), tree.get("batch_stats", {})
