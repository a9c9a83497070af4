"""Anchor-grid construction.

The reference materialises dense per-cell grid/anchor maps on every forward
(yolo_loss.py:62-75 ``pre_maps``). Here they are tiny constant arrays that
XLA folds into the decode computation; no batch dimension is needed because
broadcasting handles it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def grid_xy(in_w: int, in_h: int, dtype=jnp.float32):
    """(in_h, in_w, 2) array of cell indices (x, y)."""
    gx = np.tile(np.arange(in_w, dtype=np.float32)[None, :], (in_h, 1))
    gy = np.tile(np.arange(in_h, dtype=np.float32)[:, None], (1, in_w))
    return jnp.asarray(np.stack([gx, gy], axis=-1), dtype=dtype)


def scaled_anchors(anchors, img_w: int, img_h: int) -> np.ndarray:
    """Anchors in pixels -> fraction-of-image units (yolo_loss.py:214).

    Note the reference normalises with a transposed img_size for non-square
    inputs (mbv2_yolo.py:140 stores [H, W] but yolo_loss.py:214 indexes it as
    [W, H]); every shipped config is square so the behaviours coincide. We
    use the correct (w, h) normalisation.
    """
    a = np.asarray(anchors, dtype=np.float32)
    return a / np.asarray([img_w, img_h], dtype=np.float32)


def anchor_maps(anchors, mask, img_w: int, img_h: int, dtype=jnp.float32):
    """Per-head normalized anchor (w, h) array of shape (num_mask, 2)."""
    return jnp.asarray(scaled_anchors(anchors, img_w, img_h)[np.asarray(mask)], dtype=dtype)
