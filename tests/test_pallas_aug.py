"""Fused Pallas aug kernel (kernels/pallas_aug.py) — interpret-mode parity
with the XLA reference ops (ops/device_augment.py) and wiring through the
geometry train step.

The kernel's jitter math must equal planned_color_jitter exactly (same f32
formulas); its gaussian noise is a different deterministic stream (on-core
PRNG), so noise parity is statistical.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mobilenet_yolo_tpu.data import augment as host_aug
from mobilenet_yolo_tpu.kernels.pallas_aug import fused_slot_aug
from mobilenet_yolo_tpu.ops import device_augment as dev


def _planar(slots_hwc):
    return jnp.transpose(jnp.asarray(slots_hwc), (0, 3, 1, 2))


def _programs(rng, n):
    plans = [host_aug.sample_photometric(rng) for _ in range(n)]
    return (np.stack([p[0] for p in plans]).astype(np.int32),
            np.stack([p[1] for p in plans]).astype(np.float32))


def test_fused_kernel_jitter_matches_xla(rng):
    """Noise gates off -> kernel == planned_color_jitter (same f32 math,
    only the op-dispatch structure differs: lax.switch vs split-at-hue)."""
    n, s = 6, 32
    slots = rng.integers(0, 255, (n, s, s, 3)).astype(np.uint8)
    ops, facs = _programs(rng, n)
    got = np.asarray(fused_slot_aug(
        _planar(slots), jnp.int32(5), jnp.zeros(n, bool),
        jnp.zeros(n, np.float32), jnp.zeros(n, bool), jnp.asarray(ops),
        jnp.asarray(facs), interpret=True))
    want = np.asarray(dev.planned_color_jitter(
        jnp.asarray(slots), jnp.asarray(ops), jnp.asarray(facs)))
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), want, atol=2e-3)


def test_fused_kernel_identity_program(rng):
    n, s = 2, 16
    slots = rng.integers(0, 255, (n, s, s, 3)).astype(np.uint8)
    out = np.asarray(fused_slot_aug(
        _planar(slots), jnp.int32(0), jnp.zeros(n, bool),
        jnp.zeros(n, np.float32), jnp.zeros(n, bool),
        jnp.full((n, 5), -1, jnp.int32), jnp.ones((n, 5), jnp.float32),
        interpret=True))
    np.testing.assert_array_equal(out.transpose(0, 2, 3, 1),
                                  slots.astype(np.float32))


def _boxmuller_oracle(bits, pc, scale):
    """numpy reference of the kernel's bits -> noise math (half-height
    bits: each (u1, u2) pair yields the two normals r*cos / r*sin)."""
    u = (bits >> 8).astype(np.float64) / 16777216.0 + 1.0 / 33554432.0
    u1, u2 = u[0], u[1]
    r = np.sqrt(-2.0 * np.log(u1))
    z = np.concatenate([r * np.cos(2.0 * np.pi * u2),
                        r * np.sin(2.0 * np.pi * u2)], axis=2)
    return np.where(pc[:, None, None, None], z, z[:, 0:1]) * \
        scale[:, None, None, None]


def test_fused_kernel_noise_math(rng):
    """Injected uniform bits -> the kernel's Box-Muller / shared-plane /
    gate / scale plumbing matches a numpy oracle exactly (the Mosaic
    interpreter stubs the hardware PRNG; its stream is asserted by the
    TPU-gated test below)."""
    n, s = 4, 32
    slots = np.full((n, s, s, 3), 128, np.uint8)
    scale = np.asarray([12.0, 12.0, 5.0, 12.0], np.float32)
    gate = np.asarray([True, True, True, False])
    pc = np.asarray([False, True, False, False])
    bits = rng.integers(0, 2 ** 32, (2, n, 3, s // 2, s)).astype(np.uint32)
    out = np.asarray(fused_slot_aug(
        _planar(slots), jnp.int32(7), jnp.asarray(gate), jnp.asarray(scale),
        jnp.asarray(pc), jnp.full((n, 5), -1, jnp.int32),
        jnp.ones((n, 5), jnp.float32), interpret=True,
        debug_bits=jnp.asarray(bits)))
    want = np.clip(128.0 + _boxmuller_oracle(bits, pc, scale), 0, 255)
    want[~gate] = 128.0
    np.testing.assert_allclose(out, want, atol=1e-2)
    # shared plane: channels identical; per-channel: they differ
    np.testing.assert_array_equal(out[0][0], out[0][1])
    assert not np.array_equal(out[1][0], out[1][1])


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG stream needs a real TPU")
def test_fused_kernel_noise_stream_stats_tpu(rng):
    """On-core PRNG stream: mean ~0, std ~scale, per-slot decorrelation,
    keyed determinism (compiled kernel on hardware)."""
    n, s = 4, 64
    slots = np.full((n, s, s, 3), 128, np.uint8)
    args = (jnp.int32(7), jnp.ones(n, bool),
            jnp.full(n, 12.0, jnp.float32), jnp.zeros(n, bool),
            jnp.full((n, 5), -1, jnp.int32), jnp.ones((n, 5), jnp.float32))
    out = np.asarray(fused_slot_aug(_planar(slots), *args))
    delta = out - 128.0
    for i in range(n):
        assert abs(delta[i].mean()) < 0.5
        assert abs(delta[i].std() - 12.0) < 1.0, delta[i].std()
    assert not np.array_equal(delta[0][0], delta[2][0])
    out2 = np.asarray(fused_slot_aug(_planar(slots), *args))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(fused_slot_aug(_planar(slots), jnp.int32(8),
                                     *args[1:]))
    assert not np.array_equal(out, out3)


def test_planar_compose_matches_hwc(rng):
    """geometric_compose(planar=True) == the HWC compose on identical
    (pre-jittered) slots."""
    b, t, s = 2, 4, 24
    slots = rng.integers(0, 255, (b, t, s, s, 3)).astype(np.float32)
    src = np.tile(np.float32([0.1, 0.05, 0.9, 0.85]), (b, t, 1))
    dst = np.tile(np.float32([[0, 0, .5, .5], [.5, 0, 1, .5],
                              [0, .5, .5, 1], [.5, .5, 1, 1]]), (b, 1, 1))
    args = dict(
        fill_rect=jnp.asarray(dst), fill_color=jnp.full((b, t, 3), 99.0),
        fill_from_mean=jnp.asarray(rng.random((b, t)) < 0.5),
        flip=jnp.asarray(rng.random((b, t)) < 0.5),
        active=jnp.ones((b, t), bool))
    hwc = np.asarray(dev.geometric_compose(
        jnp.asarray(slots), jnp.asarray(src), jnp.asarray(dst),
        out_hw=(32, 32), **args))
    pl = np.asarray(dev.geometric_compose(
        jnp.transpose(jnp.asarray(slots), (0, 1, 4, 2, 3)),
        jnp.asarray(src), jnp.asarray(dst), out_hw=(32, 32), planar=True,
        **args))
    np.testing.assert_allclose(pl, hwc, atol=1e-3)


def _geom_batch_via_planner(rng, b, s):
    from mobilenet_yolo_tpu.data.geometry import GeometryPlanner
    from mobilenet_yolo_tpu.train.step import GEOMETRY_BATCH_KEYS

    planner = GeometryPlanner(stage_size=s, apply_noise=False)
    plans = []
    for i in range(b):
        n_src = 1 if i % 2 == 0 else 4
        sources = []
        for _ in range(n_src):
            img = rng.integers(0, 255, (40, 50, 3), np.uint8)
            boxes = np.asarray([[5, 5, 30, 30]], np.float32)
            sources.append((img, boxes.copy(), np.float32([1.0]),
                            np.float32([0.0])))
        plans.append(planner.plan_group(sources, rng))
    batch = {
        "slots": np.stack([p.slots for p in plans]),
        "gt": np.zeros((b, 8, 5), np.float32), "n_gt":
            np.zeros((b,), np.int32),
    }
    for i, p in enumerate(plans):
        rows = p.labels[:8]
        batch["gt"][i, :len(rows)] = rows[:, :5]
        batch["n_gt"][i] = len(rows)
    for k in GEOMETRY_BATCH_KEYS:
        if k in ("slots",):
            continue
        batch[k] = np.stack([getattr(p, k) for p in plans])
    return batch


@pytest.mark.parametrize("mesh_mode,fused_mode",
                         [(False, "interpret"), (True, "interpret"),
                          (True, "interpret-split")])
def test_geometry_step_fused_runs(rng, mesh_mode, fused_mode):
    """make_geometry_train_step with the fused kernels (full and split)
    runs end-to-end (single device and shard_mapped over the virtual
    8-device mesh) and moves params."""
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from mobilenet_yolo_tpu.parallel.mesh import create_mesh, shard_batch
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import (GEOMETRY_BATCH_KEYS,
                                               make_geometry_train_step)

    b, s = 8, 32
    cfg = {
        "img_w": s, "img_h": s, "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "yolo": {
            "num_classes": 3, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[18, 22], [24, 24], [30, 28],
                        [6, 8], [10, 12], [14, 10]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (s, s),
                                   batch_size=b)
    batch = _geom_batch_via_planner(rng, b, s)
    mesh = create_mesh(n_data=8) if mesh_mode else None
    step = make_geometry_train_step(model, cfg, tx, mesh=mesh,
                                    fused_aug=fused_mode)
    geom = tuple(jnp.asarray(batch[k]) for k in GEOMETRY_BATCH_KEYS)
    if mesh is not None:
        geom = shard_batch(mesh, geom)
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = step(state, *geom, jnp.asarray(batch["gt"]),
                          jnp.asarray(batch["n_gt"]), jax.random.PRNGKey(3),
                          out_hw=(s, s))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("full", [True, False])
def test_fused_aug_compose_matches_xla_pixels(rng, full):
    """fused_aug_compose (bf16 end-to-end, as the step wires it; both the
    full aug+compose kernel and the split kernel+XLA-compose) == the XLA
    stages to bf16 quantization: max ~2-3 intensity of 255 (two lerp
    stages at bf16), mean <0.5. Noise off (different streams). The
    planner batch mixes 1-tile and 4-tile images, so the full kernel's
    per-tile active branching and mean-fill are exercised."""
    from mobilenet_yolo_tpu.ops.device_augment import (fused_aug_compose,
                                                       geometric_compose,
                                                       slot_noise)

    b, s = 4, 32
    batch = _geom_batch_via_planner(rng, b, s)
    batch["noise_gate"][:] = False
    gb = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(3)
    fused = fused_aug_compose(
        gb["slots"], gb["src_rect"], gb["dst_rect"], gb["fill_rect"],
        gb["fill_color"], gb["fill_from_mean"], gb["flip"], gb["active"],
        (s, s), gb["noise_gate"], gb["noise_scale"],
        gb["noise_per_channel"], gb["jitter_op"], gb["jitter_factor"],
        key, dtype=jnp.bfloat16, interpret=True, full=full)
    sl = slot_noise(gb["slots"], key, gb["noise_gate"], gb["noise_scale"],
                    gb["noise_per_channel"])
    ref = geometric_compose(
        sl, gb["src_rect"], gb["dst_rect"], gb["fill_rect"],
        gb["fill_color"], gb["fill_from_mean"], gb["flip"], gb["active"],
        (s, s), jitter_op=gb["jitter_op"],
        jitter_factor=gb["jitter_factor"])
    d = np.abs(np.asarray(fused, np.float32) - np.asarray(ref))
    assert d.max() < 4.0 and d.mean() < 0.5, (d.max(), d.mean())


def test_fused_step_matches_xla_step(rng):
    """Full geometry step, fused vs XLA aug stages, noise OFF: pixels
    match to bf16 quantization (the test above), so the losses agree to
    the sensitivity of an untrained model to ~1% pixel noise (~10%).
    This is a step-WIRING check; exact parity oracles are the f32
    kernel/compose tests."""
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from mobilenet_yolo_tpu.train.state import create_train_state
    from mobilenet_yolo_tpu.train.step import (GEOMETRY_BATCH_KEYS,
                                               make_geometry_train_step)

    b, s = 4, 32
    cfg = {
        "img_w": s, "img_h": s, "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "yolo": {
            "num_classes": 3, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[18, 22], [24, 24], [30, 28],
                        [6, 8], [10, 12], [14, 10]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    model = MBv2YOLO(num_classes=3, num_anchors=3, width_mult=0.35)
    batch = _geom_batch_via_planner(rng, b, s)
    batch["noise_gate"][:] = False
    geom = tuple(jnp.asarray(batch[k]) for k in GEOMETRY_BATCH_KEYS)
    args = (jnp.asarray(batch["gt"]), jnp.asarray(batch["n_gt"]),
            jax.random.PRNGKey(3))
    losses = {}
    for mode in ("interpret", False):
        # fresh state per mode: the step donates its state argument
        state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                       (s, s), batch_size=b)
        step = make_geometry_train_step(model, cfg, tx, fused_aug=mode)
        _, metrics = step(state, *geom, *args, out_hw=(s, s))
        losses[mode] = float(metrics["loss"])
    assert np.isclose(losses["interpret"], losses[False],
                      rtol=0.1), losses


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG stream needs a real TPU")
def test_full_kernel_noise_stream_stats_tpu(rng):
    """The FULL aug+compose kernel's on-core PRNG (one stream per
    (image, tile), hashed like the split kernel's): mean ~0, std ~scale
    on an identity compose of uniform tiles, per-image decorrelation,
    keyed determinism (compiled on hardware)."""
    from mobilenet_yolo_tpu.ops.device_augment import fused_aug_compose

    b, s = 4, 64
    slots = np.full((b, 4, s, s, 3), 128, np.uint8)
    full = np.tile(np.float32([0, 0, 1, 1]), (b, 4, 1))
    act = np.zeros((b, 4), bool)
    act[:, 0] = True                      # identity paste of tile 0
    def run(key):
        return np.asarray(fused_aug_compose(
            jnp.asarray(slots), jnp.asarray(full), jnp.asarray(full),
            jnp.asarray(full), jnp.full((b, 4, 3), 127.5, jnp.float32),
            jnp.zeros((b, 4), bool), jnp.zeros((b, 4), bool),
            jnp.asarray(act), (s, s),
            jnp.ones((b, 4), bool), jnp.full((b, 4), 12.0, jnp.float32),
            jnp.zeros((b, 4), bool), jnp.full((b, 4, 5), -1, jnp.int32),
            jnp.ones((b, 4, 5), jnp.float32), key,
            dtype=jnp.float32, full=True), np.float32)
    out = run(jax.random.PRNGKey(1))
    delta = out - 128.0
    for i in range(b):
        assert abs(delta[i].mean()) < 0.5
        assert abs(delta[i].std() - 12.0) < 1.2, delta[i].std()
    assert not np.array_equal(delta[0], delta[2])   # per-image streams
    np.testing.assert_array_equal(out, run(jax.random.PRNGKey(1)))
    assert not np.array_equal(out, run(jax.random.PRNGKey(2)))
