"""Straight-through sigmoid.

The reference trains conf/class/xy channels through a custom
``autograd.Function`` whose backward passes the incoming gradient through
unchanged (reference models/yolo_loss.py:15-32). Combined with its
weighted-MSE loss this yields, w.r.t. the logits, exactly the
BCE-with-logits gradient shape ``(sigma(x) - t)`` scaled by the MSE weights
— reproduced here with ``jax.custom_vjp``.
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def sigmoid_st(x):
    """sigmoid forward, identity backward."""
    return jax.nn.sigmoid(x)


def _fwd(x):
    return jax.nn.sigmoid(x), None


def _bwd(_, g):
    return (g,)


sigmoid_st.defvjp(_fwd, _bwd)


def sigmoid(x):
    """Plain sigmoid (eval decode path, reference yolo_loss.py:187-189)."""
    return jax.nn.sigmoid(x)
