"""BN folding must leave eval outputs numerically unchanged."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.models import MBv2YOLO
from mobilenet_yolo_tpu.models.bn_fold import fold_batchnorm


def test_fold_batchnorm_preserves_eval_outputs(rng):
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # make the fold non-trivial: perturb BN stats/params away from init
    def perturb(tree, scale):
        return jax.tree.map(
            lambda v: v + scale * np.random.default_rng(1).normal(
                size=v.shape).astype(np.float32), tree)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: jnp.abs(v) + 0.3, variables["batch_stats"]),
    }

    ref = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    got = model.apply(folded, x, train=False)

    for key in ref:
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(ref[key]),
                                   rtol=2e-4, atol=2e-5)

    # every BN is now identity-normalisation
    leaves = jax.tree_util.tree_leaves_with_path(folded["batch_stats"])
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        if "mean" in name:
            assert float(jnp.abs(leaf).max()) == 0.0


def test_fold_preserves_head_bias(rng):
    """The biased head output conv (no BN) must pass through untouched."""
    model = MBv2YOLO(num_classes=4, num_anchors=3, width_mult=0.35)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    folded = fold_batchnorm(variables)
    orig = variables["params"]["yolo_headS32"]["out"]
    new = folded["params"]["yolo_headS32"]["out"]
    np.testing.assert_array_equal(np.asarray(orig["kernel"]),
                                  np.asarray(new["kernel"]))
    np.testing.assert_array_equal(np.asarray(orig["bias"]),
                                  np.asarray(new["bias"]))
