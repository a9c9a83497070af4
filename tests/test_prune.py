"""Channel pruning (prune.py + tools/prune.py).

Covers: the keep-plan selection logic, functional equivalence when the
pruned channels are dead, the slim graph training + predicting after the
cut, the Network Slimming L1 term shrinking the prunable gammas, and the
CLI round trip (artifacts rebuild a shape-consistent model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_yolo_tpu.models import build_model
from mobilenet_yolo_tpu.prune import (apply_prune, param_count, plan_prune,
                                      prunable_gammas, slim_penalty)

MODEL_CFG = {
    "img_w": 64, "img_h": 64, "batch_size": 2, "iou_weighting": 0.02,
    "train_img_size": [[64, 64]],
    "yolo": {
        "num_classes": 4, "num_anchors": 3,
        "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
        "anchors": [[34, 47], [48, 40], [70, 70],
                    [10, 12], [15, 25], [24, 18]],
        "mask": [[0, 1, 2], [3, 4, 5]],
    },
}


@pytest.fixture(scope="module")
def variables():
    model = build_model(MODEL_CFG, "mbv2")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                      train=False))()


def test_plan_respects_ratio_minkeep_rounding(variables):
    params = variables["params"]
    keep = plan_prune(params, ratio=0.5, min_keep=8, round_to=8)
    gammas = prunable_gammas(params)
    assert set(keep) == set(gammas)
    total = sum(g.size for g in gammas.values())
    kept = sum(k.size for k in keep.values())
    # global 50% cut, modulo per-site round-up
    assert kept <= 0.6 * total
    for site, k in keep.items():
        assert k.size >= min(8, gammas[site].size)
        assert k.size % 8 == 0 or k.size == gammas[site].size
        # indices sorted + unique (channel order preserved)
        assert np.all(np.diff(k) > 0)

    # ratio 0 keeps everything
    keep0 = plan_prune(params, ratio=0.0)
    assert all(keep0[s].size == gammas[s].size for s in gammas)


def test_plan_picks_smallest_gammas(variables):
    # force a known gamma pattern in one block: channels [0, 5, 7] tiny
    params = jax.tree.map(lambda a: np.array(a), variables["params"])
    g = params["backbone"]["block3"]["expand"]["bn"]["scale"]
    g[:] = 1.0
    g[[0, 5, 7]] = 1e-6
    # with every other gamma O(1) and only these three at 1e-6, a global
    # ratio of exactly 3 channels prunes exactly them
    keep = plan_prune(params, ratio=3.0 / sum(
        v.size for v in prunable_gammas(params).values()) + 1e-9,
        min_keep=1, round_to=1)
    pruned = np.setdiff1d(np.arange(g.size), keep["block3"])
    assert set(pruned.tolist()) == {0, 5, 7}


def test_dead_channel_prune_is_exact(variables):
    """Kill selected hidden channels (zero expand+depthwise BN scale/bias)
    and verify the sliced model computes the same function."""
    model = build_model(MODEL_CFG, "mbv2")
    params = jax.tree.map(lambda a: np.array(a), variables["params"])
    stats = jax.tree.map(lambda a: np.array(a), variables["batch_stats"])

    rng = np.random.default_rng(1)
    keep = {}
    for site, g in prunable_gammas(params).items():
        victims = rng.choice(g.size, size=g.size // 4, replace=False)
        keep[site] = np.setdiff1d(np.arange(g.size), victims)
        if site == "head_conv":
            bn = params["backbone"]["head_conv"]["bn"]
            bn["scale"][victims] = 0.0
            bn["bias"][victims] = 0.0
        else:
            for stage in ("expand", "depthwise"):
                bn = params["backbone"][site][stage]["bn"]
                bn["scale"][victims] = 0.0
                bn["bias"][victims] = 0.0

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    ref = model.apply({"params": params, "batch_stats": stats}, x,
                      train=False)

    new_params, new_stats, prune_cfg = apply_prune(params, stats, keep)
    pruned_cfg = dict(MODEL_CFG, prune=prune_cfg)
    pruned_model = build_model(pruned_cfg, "mbv2")
    out = pruned_model.apply({"params": new_params,
                              "batch_stats": new_stats}, x, train=False)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5)
    assert param_count(new_params) < param_count(params)


def test_pruned_model_trains_and_predicts(variables):
    from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
    from mobilenet_yolo_tpu.eval import make_predict_fn
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import make_train_step

    params = variables["params"]
    stats = variables["batch_stats"]
    keep = plan_prune(params, ratio=0.4)
    new_params, new_stats, prune_cfg = apply_prune(params, stats, keep)
    pruned_cfg = dict(MODEL_CFG, prune=prune_cfg)
    model = build_model(pruned_cfg, "mbv2")

    state, tx = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                   learning_rate=1e-3, weight_decay=1e-4)
    state = state.replace(params=jax.tree.map(jnp.asarray, new_params),
                          batch_stats=jax.tree.map(jnp.asarray, new_stats))
    step = make_train_step(model, pruned_cfg, tx)
    losses = []
    for images, gt, n_gt in synthetic_batches(4, 2, 64, 4, seed=0):
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(gt),
                              jnp.asarray(n_gt))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))

    predict = make_predict_fn(model, pruned_cfg, top_k=16)
    dets, keep_mask = predict({"params": state.params,
                               "batch_stats": state.batch_stats},
                              jnp.zeros((2, 64, 64, 3), jnp.float32),
                              0.01)
    assert np.all(np.isfinite(np.asarray(dets)))


@pytest.mark.parametrize("mode", ["loss", "prox"])
def test_slim_l1_shrinks_gammas(variables, mode):
    from mobilenet_yolo_tpu.data.synthetic import synthetic_batches
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import make_train_step

    def run(slim):
        cfg = dict(MODEL_CFG)
        if slim:
            cfg["slim_l1"] = 0.05
            cfg["slim_mode"] = mode
        model = build_model(cfg, "mbv2")
        state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                       (64, 64), learning_rate=5e-3,
                                       weight_decay=0.0)
        # fresh copies: the jitted step donates the state buffers
        state = state.replace(
            params=jax.tree.map(jnp.array, variables["params"]),
            batch_stats=jax.tree.map(jnp.array, variables["batch_stats"]))
        step = make_train_step(model, cfg, tx)
        for images, gt, n_gt in synthetic_batches(6, 2, 64, 4, seed=0):
            state, _ = step(state, jnp.asarray(images), jnp.asarray(gt),
                            jnp.asarray(n_gt))
        return float(slim_penalty(state.params))

    start = float(slim_penalty(variables["params"]))
    with_l1, without_l1 = run(True), run(False)
    assert with_l1 < without_l1
    assert with_l1 < start


def test_slim_prox_update_thresholds_by_second_moment(variables):
    """The prox shrink is lr*lam/(sqrt(v_hat)+eps): gammas whose Adam
    second moment is ~0 (dead channels) are zeroed outright, gammas with a
    real gradient history are left essentially untouched, and nothing
    outside the prunable BN scales moves."""
    from mobilenet_yolo_tpu.prune import slim_prox_update

    params = jax.tree.map(jnp.asarray, variables["params"])
    # second moments: zero (dead) everywhere except block2 (alive)
    nu = jax.tree.map(jnp.zeros_like, params)
    nu["backbone"]["block2"]["expand"]["bn"]["scale"] = jnp.ones_like(
        nu["backbone"]["block2"]["expand"]["bn"]["scale"])

    out = jax.jit(lambda p, n: slim_prox_update(
        p, n, count=jnp.asarray(1000, jnp.int32),
        lr=jnp.float32(1e-3), lam=1e-4))(params, nu)

    # same treedef (state.replace/jit compatibility)
    assert (jax.tree_util.tree_structure(out)
            == jax.tree_util.tree_structure(params))
    gammas = prunable_gammas(out)
    for site, g in gammas.items():
        if site == "block2":
            np.testing.assert_allclose(
                g, prunable_gammas(params)[site], rtol=0, atol=1e-5)
        else:
            np.testing.assert_array_equal(g, 0.0)
    # a non-gamma leaf is bit-identical
    np.testing.assert_array_equal(
        np.asarray(out["backbone"]["block2"]["expand"]["conv"]["kernel"]),
        np.asarray(params["backbone"]["block2"]["expand"]["conv"]["kernel"]))
    # BN biases untouched too (only scales are gated)
    np.testing.assert_array_equal(
        np.asarray(out["backbone"]["block3"]["expand"]["bn"]["bias"]),
        np.asarray(params["backbone"]["block3"]["expand"]["bn"]["bias"]))


def test_prune_cli_roundtrip(tmp_path, variables):
    import yaml
    from mobilenet_yolo_tpu.tools_io import save_params_npz
    from tools.prune import main as prune_main

    ckpt = tmp_path / "params.npz"
    save_params_npz(str(ckpt), variables["params"],
                    variables["batch_stats"])
    model_yaml = tmp_path / "model.yaml"
    with open(model_yaml, "w") as f:
        yaml.safe_dump(MODEL_CFG, f)

    out = tmp_path / "pruned"
    prune_main(["--model-yaml", str(model_yaml), "-c", str(ckpt),
                    "--ratio", "0.3", "--out", str(out)])
    assert (out / "params.npz").exists()
    assert (out / "summary.json").exists()

    # artifacts rebuild a shape-consistent slim model (the --init-from path)
    from mobilenet_yolo_tpu.tools_io import load_params_npz
    with open(out / "model.yaml") as f:
        pruned_cfg = yaml.safe_load(f)
    model = build_model(pruned_cfg, "mbv2")
    params, stats = load_params_npz(str(out / "params.npz"))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    outp = model.apply({"params": jax.tree.map(jnp.asarray, params),
                        "batch_stats": jax.tree.map(jnp.asarray, stats)},
                       x, train=False)
    assert outp["out0"].shape == (1, 2, 2, 27)

    # iterative pruning is rejected
    with pytest.raises(SystemExit):
        prune_main(["--model-yaml", str(out / "model.yaml"),
                        "-c", str(out / "params.npz"),
                        "--ratio", "0.3", "--out", str(tmp_path / "p2")])


def test_mbv3_dead_channel_prune_is_exact():
    """MBv3: bneck hidden channels prunable; the 960-ch head is NOT (its
    consumer is a width-coupled DepthwiseConvolution) — structural
    detection, and the slim graph matches the parent on dead channels."""
    model = build_model(MODEL_CFG, "mbv3")
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0,
                                           train=False))()
    params = jax.tree.map(lambda a: np.array(a), variables["params"])
    stats = jax.tree.map(lambda a: np.array(a), variables["batch_stats"])

    gammas = prunable_gammas(params)
    assert "head_conv" not in gammas          # structurally excluded
    assert "bneck0" in gammas and "bneck2_1" in gammas

    rng = np.random.default_rng(2)
    keep = {}
    for site in ("bneck3", "bneck7", "bneck2_0"):
        g = gammas[site]
        victims = rng.choice(g.size, size=g.size // 4, replace=False)
        keep[site] = np.setdiff1d(np.arange(g.size), victims)
        for stage in ("expand", "depthwise"):
            bn = params["backbone"][site][stage]["bn"]
            bn["scale"][victims] = 0.0
            bn["bias"][victims] = 0.0

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    ref = model.apply({"params": params, "batch_stats": stats}, x,
                      train=False)
    new_params, new_stats, prune_cfg = apply_prune(params, stats, keep)
    assert "backbone_head" not in prune_cfg
    pruned_model = build_model(dict(MODEL_CFG, prune=prune_cfg), "mbv3")
    out = pruned_model.apply({"params": new_params,
                              "batch_stats": new_stats}, x, train=False)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-5)


def test_mbv3_macc_head_is_prunable():
    """MBv3-MACC's conv_for_S32 is a plain 1x1 conv, so its 960-ch
    backbone head IS prunable — and the slim graph rebuilds."""
    model = build_model(MODEL_CFG, "mbv3_macc")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    params, stats = variables["params"], variables["batch_stats"]
    gammas = prunable_gammas(params)
    assert "head_conv" in gammas

    keep = plan_prune(params, ratio=0.3)
    new_params, new_stats, prune_cfg = apply_prune(params, stats, keep)
    assert prune_cfg["backbone_head"] < 960
    pruned = build_model(dict(MODEL_CFG, prune=prune_cfg), "mbv3_macc")
    out = pruned.apply({"params": new_params, "batch_stats": new_stats},
                       x, train=False)
    assert out["out0"].shape == (1, 2, 2, 27)

    # mbv3 (non-macc) rejects a backbone_head override outright
    with pytest.raises(ValueError, match="not prunable"):
        build_model(dict(MODEL_CFG, prune={"backbone_head": 800}), "mbv3")
