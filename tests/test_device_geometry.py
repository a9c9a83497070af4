"""Device-side geometric augmentation tests.

Three layers of checks:
* the TPU compose primitive (ops/device_augment.py:geometric_compose)
  reproduces host slicing/resizing exactly where they are defined to agree
  (identity, integer crops, flips, fills; cv2.INTER_LINEAR interiors);
* the host planner (data/geometry.py) produces the SAME labels as the host
  pixel pipeline given the same rng stream — the two paths share the
  parameter samplers, so this guards the glue math;
* the Loader/Trainer integration: geometry batches feed the jitted
  geometry train step (single device and 8-device mesh) and learn.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.data import augment
from mobilenet_yolo_tpu.data.geometry import (GeometryPlanner,
                                              plan_source_geometry)
from mobilenet_yolo_tpu.data.mosaic import mosaic
from mobilenet_yolo_tpu.ops.device_augment import geometric_compose


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _compose_args(slots, src, dst, fill, fcol, ffm, flip, act):
    return [jnp.asarray(np.asarray(a)[None]) for a in
            (slots, src, dst, fill, fcol, ffm, flip, act)]


def _one_slot(img, S):
    slots = np.zeros((4, S, S, 3), np.uint8)
    slots[0] = img
    return slots


FULL = np.tile(np.float32([0, 0, 1, 1]), (4, 1))
GRAY = np.full((4, 3), 127.5, np.float32)
OFF4 = np.zeros(4, bool)
ACT1 = np.asarray([True, False, False, False])


# ------------------------------------------------------- compose primitive


def test_compose_identity_exact(rng):
    S = 24
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    out = geometric_compose(*_compose_args(
        _one_slot(img, S), FULL, FULL, FULL, GRAY, OFF4, OFF4, ACT1), (S, S))
    assert np.array_equal(np.asarray(out[0]), img.astype(np.float32))


def test_compose_integer_crop_matches_slice(rng):
    S = 32
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    src = FULL.copy()
    src[0] = [4 / S, 8 / S, 28 / S, 24 / S]
    out = geometric_compose(*_compose_args(
        _one_slot(img, S), src, FULL, FULL, GRAY, OFF4, OFF4, ACT1), (16, 24))
    assert np.array_equal(np.asarray(out[0]),
                          img[8:24, 4:28].astype(np.float32))


def test_compose_flip_exact(rng):
    S = 24
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    flip = np.asarray([True, False, False, False])
    out = geometric_compose(*_compose_args(
        _one_slot(img, S), FULL, FULL, FULL, GRAY, OFF4, flip, ACT1), (S, S))
    assert np.array_equal(np.asarray(out[0]),
                          img[:, ::-1].astype(np.float32))


def test_compose_expand_fill_and_resample(rng):
    """Expand-style single: constant fill outside dst, cv2-bilinear
    content inside (interior exact up to rounding)."""
    cv2 = pytest.importorskip("cv2")
    S = 32
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    dst = FULL.copy()
    dst[0] = [0.25, 0.25, 0.75, 0.75]
    out = np.asarray(geometric_compose(*_compose_args(
        _one_slot(img, S), FULL, dst, FULL, np.full((4, 3), 100.0, np.float32),
        OFF4, OFF4, ACT1), (S, S))[0])
    assert np.allclose(out[0, 0], 100.0) and np.allclose(out[-1, -1], 100.0)
    ref = cv2.resize(img.astype(np.float32), (16, 16),
                     interpolation=cv2.INTER_LINEAR)
    assert np.abs(out[8:24, 8:24] - ref).max() <= 0.51


def test_compose_bf16_close_to_f32(rng):
    """dtype=bfloat16 (the --bf16 aug path) tracks the f32 compose+jitter
    within ~1 intensity level — bf16's 8-bit mantissa quantizes [0,255]
    uint8-like, so the bandwidth halving is augmentation-invisible."""
    from mobilenet_yolo_tpu.data.augment import sample_photometric

    S = 32
    nprng = np.random.default_rng(9)
    slots = nprng.integers(0, 255, (4, S, S, 3), np.uint8)
    src = np.tile(np.float32([0.1, 0.05, 0.9, 0.95]), (4, 1))
    dst = np.float32([[0, 0, .5, .5], [.5, 0, 1, .5],
                      [0, .5, .5, 1], [.5, .5, 1, 1]])
    act = np.ones(4, bool)
    flip = np.asarray([True, False, True, False])
    plans = [sample_photometric(nprng) for _ in range(4)]
    jop = jnp.asarray(np.stack([p[0] for p in plans])[None])
    jfac = jnp.asarray(np.stack([p[1] for p in plans])[None])
    args = _compose_args(slots, src, dst, dst, GRAY,
                         np.ones(4, bool), flip, act)
    f32 = np.asarray(geometric_compose(
        *args, (S, S), jitter_op=jop, jitter_factor=jfac))
    b16 = np.asarray(geometric_compose(
        *args, (S, S), jitter_op=jop, jitter_factor=jfac,
        dtype=jnp.bfloat16).astype(jnp.float32))
    assert b16.dtype == np.float32
    # per-op quantization ~0.5-1 level compounds over a planned chain
    assert np.abs(b16 - f32).max() <= 4.0
    assert np.abs(b16 - f32).mean() < 0.5


def test_compose_mosaic_mean_fill(rng):
    """fill_from_mean paints the tile with the source-window mean."""
    S = 16
    img = np.full((S, S, 3), 60, np.uint8)
    img[:, : S // 2] = 20  # mean = 40
    dst = FULL.copy()
    fill = FULL.copy()
    dst[0] = [0.0, 0.0, 0.5, 0.5]
    fill[0] = [0.0, 0.0, 1.0, 1.0]
    ffm = np.asarray([True, False, False, False])
    out = np.asarray(geometric_compose(*_compose_args(
        _one_slot(img, S), FULL, dst, fill, np.zeros((4, 3), np.float32),
        ffm, OFF4, ACT1), (S, S))[0])
    # outside the paste rect: the mean fill
    assert np.allclose(out[12, 12], 40.0)
    # inside: resampled content, not fill
    assert not np.allclose(out[2, 2], 40.0)


def test_compose_inactive_tiles_are_ignored(rng):
    S = 8
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    slots = np.zeros((4, S, S, 3), np.uint8)
    slots[0] = img
    slots[1] = 255 - img  # would overwrite everything if active
    out = geometric_compose(*_compose_args(
        slots, FULL, FULL, FULL, GRAY, OFF4, OFF4, ACT1), (S, S))
    assert np.array_equal(np.asarray(out[0]), img.astype(np.float32))


def test_compose_degenerate_rects_are_finite(rng):
    """An expand-crop that misses the source entirely (no boxes to anchor
    it) produces zero-area src/dst rects — the compose must yield pure
    fill, never NaN (guarded denominators in the weight matrices)."""
    S = 16
    img = rng.integers(0, 255, (S, S, 3), np.uint8)
    src = FULL.copy()
    dst = FULL.copy()
    src[0] = [0.4, 0.4, 0.4, 0.4]   # zero-area
    dst[0] = [0.7, 0.7, 0.7, 0.7]
    out = np.asarray(geometric_compose(*_compose_args(
        _one_slot(img, S), src, dst, FULL,
        np.full((4, 3), 100.0, np.float32), OFF4, OFF4, ACT1), (S, S))[0])
    assert np.isfinite(out).all()
    assert np.allclose(out, 100.0)  # fill everywhere, empty paste


def test_multi_host_geometry_plan_lockstep(tmp_path, rng):
    """Every host derives the same geometry epoch plan and takes its
    contiguous slice: per-host batches concatenate into the single-host
    global batch (same out sizes, same compose parameters)."""
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader

    d = _make_shard(tmp_path, rng)

    def batches(p_idx, n_proc):
        ds = DetectionDataset(RecordReader(d), phase="train",
                              apply_noise=False, apply_photometric=False)
        ld = Loader(ds, 4, [[64, 64], [96, 96]], [0.5] * 3, [1.0] * 3,
                    mosaic_num=[1, 2], max_gt=10, prefetch=0,
                    device_geometry=True, stage_size=64, seed=3,
                    shard_by_process=True)
        ld._process_slice = lambda: (p_idx, n_proc)
        ld.epoch = 1  # fixed epoch => identical plan across "hosts"
        return list(ld._epoch_batches())

    single = batches(0, 1)
    h0 = batches(0, 2)
    h1 = batches(1, 2)
    assert len(single) == len(h0) == len(h1) > 0
    for sb, a, b in zip(single, h0, h1):
        # lockstep output sizes; each host holds half the group batch
        assert a["out_size"] == b["out_size"] == sb["out_size"]
        assert a["slots"].shape[0] == b["slots"].shape[0] == 2
        assert sb["slots"].shape[0] == 4
        # host 0's slice is a same-rng prefix of the single-host batch
        # (per-batch rng is keyed by (seed, epoch, p_idx, batch_idx) and
        # host 0 plans the same leading groups)
        np.testing.assert_array_equal(a["gt"], sb["gt"][:2])
        np.testing.assert_array_equal(a["src_rect"], sb["src_rect"][:2])
        np.testing.assert_array_equal(
            a["slots"][a["active"]], sb["slots"][:2][sb["active"][:2]])


# --------------------------------------------------- seg target compose


def test_seg_compose_identity_matches_area_resize(rng):
    """Full rects: /16 targets == the host path's AREA-resize of the
    per-class masks (exact block means at integer scale)."""
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.ops.device_augment import seg_compose

    S, C = 64, 2
    ids = rng.integers(0, C + 1, (S, S), np.uint8)
    slots = np.zeros((1, 4, S, S), np.uint8)
    slots[0, 0] = ids
    act = np.zeros((1, 4), bool)
    act[0, 0] = True
    out = np.asarray(seg_compose(
        jnp.asarray(slots), jnp.asarray(FULL[None]), jnp.asarray(FULL[None]),
        jnp.asarray(np.zeros((1, 4), bool)), jnp.asarray(act),
        (S // 16, S // 16), C)[0])
    for c in range(1, C + 1):
        mask = (ids == c).astype(np.float32) * 255.0
        ref = cv2.resize(mask, (S // 16, S // 16),
                         interpolation=cv2.INTER_AREA) / 255.0
        np.testing.assert_allclose(out[..., c - 1], ref, atol=1e-5)


def test_seg_compose_crop_and_flip(rng):
    """16-aligned crop + flip == host slice/flip then AREA resize."""
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.ops.device_augment import seg_compose

    S, C = 64, 1
    ids = (rng.random((S, S)) < 0.4).astype(np.uint8)
    slots = np.zeros((1, 4, S, S), np.uint8)
    slots[0, 0] = ids
    src = FULL.copy()
    src[0] = [16 / S, 0, 48 / S, 32 / S]  # cols 16:48, rows 0:32 (flipped)
    act = np.zeros((1, 4), bool)
    act[0, 0] = True
    flip = np.zeros((1, 4), bool)
    flip[0, 0] = True
    out = np.asarray(seg_compose(
        jnp.asarray(slots), jnp.asarray(src[None]), jnp.asarray(FULL[None]),
        jnp.asarray(flip), jnp.asarray(act), (2, 2), C)[0])
    crop = ids[:, ::-1][0:32, 16:48].astype(np.float32)
    ref = cv2.resize(crop * 255.0, (2, 2),
                     interpolation=cv2.INTER_AREA) / 255.0
    np.testing.assert_allclose(out[..., 0], ref, atol=1e-5)


def test_seg_compose_inactive_is_zero(rng):
    from mobilenet_yolo_tpu.ops.device_augment import seg_compose

    S = 32
    slots = np.full((1, 4, S, S), 2, np.uint8)  # garbage everywhere
    out = np.asarray(seg_compose(
        jnp.asarray(slots), jnp.asarray(FULL[None]), jnp.asarray(FULL[None]),
        jnp.asarray(np.zeros((1, 4), bool)),
        jnp.asarray(np.zeros((1, 4), bool)), (2, 2), 2)[0])
    assert np.array_equal(out, np.zeros_like(out))


def test_geometry_seg_end_to_end(tmp_path, rng):
    """Seg dataset through Loader(device_geometry) + segmentation train
    step: seg batch keys present, one step runs, params update."""
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    d = str(tmp_path / "segshard")
    with RecordWriter(d) as w:
        for i in range(8):
            img = rng.integers(0, 255, (80, 100, 3), np.uint8)
            seg = np.zeros((80, 100), np.uint8)
            seg[40:60] = 1
            seg[60:80] = 2
            ok, jbuf = cv2.imencode(".jpg", img)
            ok, sbuf = cv2.imencode(".png", seg)
            labels = np.asarray([[1 + i % 3, 0.5, 0.5, 0.4, 0.5]],
                                np.float32)
            w.append_record(jbuf.tobytes(), labels, sbuf.tobytes())

    cfg = {
        "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "seg": {"num_classes": 2},
        "yolo": {
            "num_classes": 4, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[34, 47], [48, 40], [70, 70],
                        [10, 12], [15, 25], [24, 18]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    model = build_model(cfg, "mbv2")
    trainer = Trainer(model, cfg, ["bg", "a", "b", "c"],
                      TrainerConfig(epochs=1, checkpoint_dir=str(
                          tmp_path / "ck"), tensorboard_dir=None),
                      verbose=False, segmentation=True,
                      device_geometry=True)
    ds = DetectionDataset(RecordReader(d), phase="train", has_seg=True,
                          seg_num_classes=2, apply_noise=False,
                          apply_photometric=False)
    loader = Loader(ds, batch_size=4, transform_size=[[64, 64]],
                    mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1, 2],
                    max_gt=10, prefetch=0, device_geometry=True,
                    stage_size=64)
    b = next(iter(loader))
    assert b["seg_slots"].shape == (4, 4, 64, 64)
    assert b["seg_active"].shape == (4, 4)
    metrics = trainer.train_epoch(loader, epoch=0)
    assert np.isfinite(metrics["loss"])
    assert "seg_obj" in metrics


# ------------------------------------------------- planner label parity


def _host_single_labels(img, boxes, cls, diff, rng, expand_scale=1.5,
                        allow_expand=True, photometric=False):
    """The host pixel path's label math (DetectionDataset.get_single)."""
    img2, nb, nl, nd, _ = augment.transform_od(
        img, boxes, cls, diff, rng, phase="train",
        allow_expand=allow_expand, expand_scale=expand_scale,
        photometric=photometric)
    nh, nw = img2.shape[:2]
    if nb.shape[0]:
        bw = (nb[:, 2] - nb[:, 0]) / nw
        bh = (nb[:, 3] - nb[:, 1]) / nh
        cx = nb[:, 0] / nw + bw / 2
        cy = nb[:, 1] / nh + bh / 2
        rows = np.stack([nl, cx, cy, bw, bh, nd], -1).astype(np.float32)
    else:
        rows = np.zeros((0, 6), np.float32)
    return img2, rows


def test_single_labels_match_host_path():
    """Same rng stream -> identical labels from the planner and the host
    pixel pipeline (they share the samplers)."""
    base = np.random.default_rng(3)
    for trial in range(20):
        h, w = int(base.integers(60, 160)), int(base.integers(60, 160))
        n = int(base.integers(0, 5))
        img = base.integers(0, 255, (h, w, 3), np.uint8)
        x1 = base.uniform(0, w * 0.6, n)
        y1 = base.uniform(0, h * 0.6, n)
        boxes = np.stack([x1, y1, x1 + base.uniform(5, w * 0.4, n),
                          y1 + base.uniform(5, h * 0.4, n)],
                         -1).astype(np.float32)
        cls = base.integers(1, 4, n).astype(np.float32)
        diff = (base.random(n) < 0.3).astype(np.float32)

        seed = int(base.integers(0, 2 ** 31))
        _, host_rows = _host_single_labels(
            img, boxes.copy(), cls, diff, np.random.default_rng(seed))
        src, dst, flip, _, dev_rows = plan_source_geometry(
            h, w, boxes.copy(), cls, diff, np.random.default_rng(seed),
            expand_scale=1.5, allow_expand=True)
        np.testing.assert_allclose(dev_rows, host_rows, rtol=0, atol=1e-6)
        assert (src <= 1.0 + 1e-6).all() and (src >= -1e-6).all()


def test_single_labels_match_host_path_with_photometric():
    """plan_group (photometric planning ON) == host get_single labels with
    the photometric pass applied — the planner's jitter draws consume the
    stream exactly where transform_od's do."""
    base = np.random.default_rng(29)
    planner = GeometryPlanner(stage_size=64, expand_scale=1.5,
                              apply_noise=False)
    for trial in range(10):
        h, w = int(base.integers(60, 140)), int(base.integers(60, 140))
        img = base.integers(0, 255, (h, w, 3), np.uint8)
        x1, y1 = base.uniform(0, w * 0.5), base.uniform(0, h * 0.5)
        boxes = np.asarray([[x1, y1, x1 + w * 0.3, y1 + h * 0.3]],
                           np.float32)
        cls = np.asarray([1.0], np.float32)
        diff = np.asarray([0.0], np.float32)
        seed = int(base.integers(0, 2 ** 31))
        _, host_rows = _host_single_labels(
            img, boxes.copy(), cls, diff, np.random.default_rng(seed),
            photometric=True)
        plan = planner.plan_group([(img, boxes.copy(), cls, diff)],
                                  np.random.default_rng(seed))
        np.testing.assert_allclose(plan.labels, host_rows, rtol=0,
                                   atol=1e-6)
        # a planned program exists (some trial applies at least one op)
        assert plan.jitter_op.shape == (4, 5)


def test_mosaic_labels_match_host_path():
    """Group-of-N planning == host get_group label math, same rng — with
    photometric planning ON (the production geometry config), so the
    planner's jitter draws must sit at exactly transform_od's position in
    the stream for the geometric draws to stay aligned."""
    base = np.random.default_rng(11)
    planner = GeometryPlanner(stage_size=64, expand_scale=1.5,
                              apply_noise=False)
    assert planner.apply_photometric
    for trial in range(8):
        num = int(base.integers(2, 5))
        sources = []
        for _ in range(num):
            h, w = int(base.integers(60, 140)), int(base.integers(60, 140))
            img = base.integers(0, 255, (h, w, 3), np.uint8)
            x1, y1 = base.uniform(0, w * 0.5), base.uniform(0, h * 0.5)
            boxes = np.asarray([[x1, y1, x1 + w * 0.3, y1 + h * 0.3]],
                               np.float32)
            sources.append((img, boxes, np.asarray([2.0], np.float32),
                            np.asarray([0.0], np.float32)))

        seed = int(base.integers(0, 2 ** 31))
        # host path: per-source transform (expand gate still drawn), then
        # mosaic composition
        hrng = np.random.default_rng(seed)
        group = []
        for img, boxes, cls, diff in sources:
            img2, rows = _host_single_labels(img, boxes.copy(), cls, diff,
                                             hrng, allow_expand=False,
                                             photometric=True)
            group.append((img2, rows))
        _, host_rows = mosaic(group, (1000, 1000), hrng)

        plan = planner.plan_group(
            [(img, boxes.copy(), cls, diff)
             for img, boxes, cls, diff in sources],
            np.random.default_rng(seed))
        np.testing.assert_allclose(plan.labels, host_rows, rtol=0,
                                   atol=1e-6)
        assert plan.active[:num].all() and not plan.active[num:].any()
        assert plan.fill_from_mean[:num].all()


def test_planner_pixels_close_to_host_path():
    """With stage_size == native size (no staging loss), the composed
    pixels match the host crop+resize within resampler tolerance."""
    cv2 = pytest.importorskip("cv2")
    S = 96
    base = np.random.default_rng(5)
    # smooth image so sub-pixel resampler differences stay small
    img = cv2.GaussianBlur(
        base.integers(0, 255, (S, S, 3), np.uint8), (9, 9), 3.0)
    boxes = np.asarray([[20, 25, 70, 80]], np.float32)
    cls = np.asarray([1.0], np.float32)
    diff = np.asarray([0.0], np.float32)

    seed = 123
    himg, _ = _host_single_labels(img, boxes.copy(), cls, diff,
                                  np.random.default_rng(seed),
                                  photometric=True)
    host_out = cv2.resize(himg.astype(np.float32), (64, 64),
                          interpolation=cv2.INTER_LINEAR)

    planner = GeometryPlanner(stage_size=S, expand_scale=1.5,
                              apply_noise=False)
    plan = planner.plan_group([(img, boxes.copy(), cls, diff)],
                              np.random.default_rng(seed))
    # apply the host-planned photometric program on device too (the host
    # path above ran photometric_distort inside transform_od)
    out = np.asarray(geometric_compose(*_compose_args(
        plan.slots, plan.src_rect, plan.dst_rect, plan.fill_rect,
        plan.fill_color, plan.fill_from_mean, plan.flip, plan.active),
        (64, 64), jitter_op=jnp.asarray(plan.jitter_op[None]),
        jitter_factor=jnp.asarray(plan.jitter_factor[None]))[0])
    assert np.abs(out - host_out).mean() < 3.0


# ------------------------------------------------------- integration


def _make_shard(tmp_path, rng, n=12):
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.records import RecordWriter

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(n):
            img = rng.integers(0, 255, (80, 100, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            labels = np.asarray([[1 + i % 3, 0.5, 0.5, 0.4, 0.5]],
                                np.float32)
            w.append_record(buf.tobytes(), labels)
    return d


def test_loader_geometry_batches(tmp_path, rng):
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader

    d = _make_shard(tmp_path, rng)
    ds = DetectionDataset(RecordReader(d), phase="train", expand_scale=1.5,
                          apply_noise=False, apply_photometric=False)
    loader = Loader(ds, batch_size=4, transform_size=[[64, 64], [96, 96]],
                    mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1, 4],
                    max_gt=10, prefetch=0, device_geometry=True,
                    stage_size=72)
    batches = list(loader)
    assert len(batches) >= 1
    for b in batches:
        assert b["slots"].shape == (4, 4, 72, 72, 3)
        assert b["slots"].dtype == np.uint8
        for k in ("src_rect", "dst_rect", "fill_rect"):
            assert b[k].shape == (4, 4, 4)
        assert b["out_size"] in ((64, 64), (96, 96))
        assert b["gt"].shape == (4, 10, 5)
        assert (b["n_gt"] >= 0).all()
        assert b["active"].any(axis=1).all()  # every output has >=1 tile


def test_grain_loader_geometry_mp(tmp_path, rng):
    """GrainLoader(device_geometry=True) with mp workers yields batches
    CONTENT-identical to the serial Loader on the same seed — guards
    against slot-buffer aliasing under grain's deep threaded prefetch
    (the GrainLoader must not reuse the ring: hundreds of queued batches
    would alias a handful of buffers)."""
    pytest.importorskip("grain")
    from mobilenet_yolo_tpu.data.grain_pipeline import GrainLoader
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader

    d = _make_shard(tmp_path, rng)
    ds = DetectionDataset(RecordReader(d), phase="train",
                          apply_noise=False, apply_photometric=False)
    kw = dict(mosaic_num=[1, 2], max_gt=10, prefetch=0,
              device_geometry=True, stage_size=64, seed=5)
    gl = GrainLoader(ds, 4, [[64, 64]], [0.5] * 3, [1.0] * 3,
                     num_workers=2, **kw)
    sl = Loader(ds, 4, [[64, 64]], [0.5] * 3, [1.0] * 3, **kw)
    grain_batches = list(gl)
    serial_batches = list(sl)
    assert grain_batches and len(grain_batches) == len(serial_batches)
    for gb, sb in zip(grain_batches, serial_batches):
        assert gb["slots"].shape == (4, 4, 64, 64, 3)
        assert gb["active"].any(axis=1).all()
        np.testing.assert_array_equal(
            gb["slots"][gb["active"]], sb["slots"][sb["active"]])
        np.testing.assert_array_equal(gb["gt"], sb["gt"])
        np.testing.assert_array_equal(gb["src_rect"], sb["src_rect"])


def test_geometry_train_step_learns(tmp_path, rng):
    """One jitted geometry step runs and updates params (single device)."""
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    cfg = {
        "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "yolo": {
            "num_classes": 4, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[34, 47], [48, 40], [70, 70],
                        [10, 12], [15, 25], [24, 18]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    model = build_model(cfg, "mbv2")
    trainer = Trainer(model, cfg, ["bg", "a", "b", "c"],
                      TrainerConfig(epochs=1, checkpoint_dir=str(
                          tmp_path / "ckpt"), tensorboard_dir=None),
                      verbose=False, device_geometry=True)

    d = _make_shard(tmp_path, rng, n=8)
    ds = DetectionDataset(RecordReader(d), phase="train",
                          apply_noise=False, apply_photometric=False)
    loader = Loader(ds, batch_size=4, transform_size=[[64, 64]],
                    mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1, 2],
                    max_gt=10, prefetch=0, device_geometry=True,
                    stage_size=64)
    before = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
    metrics = trainer.train_epoch(loader, epoch=0)
    assert np.isfinite(metrics["loss"])
    after = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_geometry_step_on_mesh(tmp_path, rng):
    """Geometry step under an 8-device data-parallel mesh compiles and
    runs (GSPMD shards the staged slots over the batch axis)."""
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader
    from mobilenet_yolo_tpu.models import build_model
    from mobilenet_yolo_tpu.parallel.mesh import create_mesh
    from mobilenet_yolo_tpu.train.loop import Trainer, TrainerConfig

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = {
        "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "yolo": {
            "num_classes": 4, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[34, 47], [48, 40], [70, 70],
                        [10, 12], [15, 25], [24, 18]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    mesh = create_mesh(n_data=8)
    model = build_model(cfg, "mbv2")
    trainer = Trainer(model, cfg, ["bg", "a", "b", "c"],
                      TrainerConfig(epochs=1, checkpoint_dir=str(
                          tmp_path / "ckpt"), tensorboard_dir=None),
                      verbose=False, mesh=mesh, device_geometry=True)
    d = _make_shard(tmp_path, rng, n=8)
    ds = DetectionDataset(RecordReader(d), phase="train",
                          apply_noise=False, apply_photometric=False)
    loader = Loader(ds, batch_size=8, transform_size=[[64, 64]],
                    mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1, 4],
                    max_gt=10, prefetch=0, device_geometry=True,
                    stage_size=64)
    metrics = trainer.train_epoch(loader, epoch=0)
    assert np.isfinite(metrics["loss"])
