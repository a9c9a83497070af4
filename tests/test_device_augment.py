"""Device-side pixel augmentation: math parity with the host ops, range
invariants, and the pixel_aug train-step wiring."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilenet_yolo_tpu.data import augment as host_aug
from mobilenet_yolo_tpu.ops import device_augment as dev


def test_hsv_round_trip(rng):
    x = jnp.asarray(rng.random((6, 8, 3)).astype(np.float32))
    h, s, v = dev._rgb_to_hsv(x)
    back = dev._hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_device_hsv_matches_host(rng):
    x = rng.random((5, 7, 3)).astype(np.float32)
    h, s, v = dev._rgb_to_hsv(jnp.asarray(x))
    host = host_aug._rgb_to_hsv(x)
    np.testing.assert_allclose(np.asarray(h), host[..., 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), host[..., 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), host[..., 2], atol=1e-5)


def test_color_jitter_range_shape_determinism(rng):
    imgs = rng.integers(0, 255, (4, 16, 20, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(3)
    out1 = np.asarray(dev.color_jitter(jnp.asarray(imgs), key))
    out2 = np.asarray(dev.color_jitter(jnp.asarray(imgs), key))
    np.testing.assert_array_equal(out1, out2)  # keyed determinism
    assert out1.shape == imgs.shape and out1.dtype == np.float32
    assert out1.min() >= 0.0 and out1.max() <= 255.0
    # different key -> different augmentation
    out3 = np.asarray(dev.color_jitter(jnp.asarray(imgs),
                                       jax.random.PRNGKey(4)))
    assert not np.array_equal(out1, out3)


def test_color_jitter_is_per_image(rng):
    """Identical images in one batch must receive independent draws."""
    img = rng.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    batch = jnp.asarray(np.stack([img] * 8))
    out = np.asarray(dev.color_jitter(batch, jax.random.PRNGKey(0)))
    diffs = [not np.array_equal(out[i], out[j])
             for i in range(8) for j in range(i + 1, 8)]
    assert any(diffs)


def test_planned_jitter_matches_host_photometric(rng):
    """Host-planned op order + factors applied on device == the host's
    photometric_distort pixel-for-pixel (up to the host's final uint8
    truncation and HSV float noise) — closes the op-order fidelity delta
    of the fixed-order color_jitter (reference shuffles per image,
    image_augmentation.py:169-198)."""
    for trial in range(12):
        img = rng.integers(0, 255, (24, 28, 3)).astype(np.uint8)
        seed = int(rng.integers(0, 2 ** 31))
        r1, r2 = (np.random.default_rng(seed) for _ in range(2))
        op_ids, factors = host_aug.sample_photometric(r1)
        host = host_aug.photometric_distort(img, r2).astype(np.float32)
        # identical rng stream consumption
        assert r1.random() == r2.random()
        got = np.asarray(dev.planned_color_jitter(
            jnp.asarray(img[None]), jnp.asarray(op_ids[None]),
            jnp.asarray(factors[None]))[0])
        # host casts to uint8 (truncation, <=1) at the very end; HSV and
        # pow round-trips add small float noise on top
        assert np.abs(got - host).max() <= 2.0, \
            (trial, op_ids, np.abs(got - host).max())


def test_planned_jitter_identity_program(rng):
    img = rng.integers(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(dev.planned_color_jitter(
        jnp.asarray(img), jnp.full((2, 5), -1, jnp.int32),
        jnp.ones((2, 5), jnp.float32)))
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_planned_jitter_order_matters(rng):
    """Same ops in different order produce different pixels — the very
    thing the fixed-order jitter could not express."""
    img = jnp.asarray(rng.integers(0, 255, (1, 16, 16, 3)).astype(np.uint8))
    f = jnp.asarray(np.float32([[1.4, 0.6, 1.0, 1.0, 1.0]]))
    ab = np.asarray(dev.planned_color_jitter(
        img, jnp.asarray(np.int32([[4, 0, -1, -1, -1]])), f))  # gamma, b
    ba = np.asarray(dev.planned_color_jitter(
        img, jnp.asarray(np.int32([[0, 4, -1, -1, -1]])),
        jnp.asarray(np.float32([[0.6, 1.4, 1.0, 1.0, 1.0]]))))  # b, gamma
    assert not np.allclose(ab, ba)


def test_additive_noise_stats(rng):
    imgs = jnp.full((64, 8, 8, 3), 128.0, jnp.float32)
    out = np.asarray(dev.additive_noise(imgs, jax.random.PRNGKey(1)))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    changed = np.asarray([not np.allclose(out[i], 128.0) for i in range(64)])
    # Sometimes(0.5) gate: roughly half the batch gets noise
    assert 10 < changed.sum() < 54


def test_pixel_aug_train_step_runs():
    from mobilenet_yolo_tpu.models import MBv2YOLO
    from mobilenet_yolo_tpu.train import create_train_state, make_train_step

    cfg = {
        "img_w": 64, "img_h": 64, "iou_weighting": 0.02,
        "normalize": {"mean": [0.5] * 3, "std": [1.0] * 3},
        "yolo": {
            "num_classes": 2, "num_anchors": 3,
            "ignore_thresh": [0.6, 0.55], "iou_thresh": 0.55,
            "anchors": [[20, 24], [30, 30], [44, 40],
                        [6, 8], [10, 14], [14, 10]],
            "mask": [[0, 1, 2], [3, 4, 5]],
        },
    }
    model = MBv2YOLO(num_classes=2, num_anchors=3, width_mult=0.35)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                                   learning_rate=1e-3, batch_size=2)
    step = make_train_step(model, cfg, tx, normalize=True, pixel_aug=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)), jnp.uint8)
    gt = np.zeros((2, 3, 5), np.float32)
    gt[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    from mobilenet_yolo_tpu.data import augment
    plans = [augment.sample_photometric(rng) for _ in range(2)]
    jop = jnp.asarray(np.stack([p[0] for p in plans]))
    jfac = jnp.asarray(np.stack([p[1] for p in plans]))
    state, metrics = step(state, images, jnp.asarray(gt),
                          jnp.asarray([1, 1], np.int32), jop, jfac)
    assert np.isfinite(float(metrics["loss"]))


def test_loader_plans_pixel_aug_matching_host(tmp_path, rng):
    """A train Loader over a dataset with apply_photometric=False emits
    host-planned jitter programs (op ORDER + factors from the host's own
    sample_photometric), and applying them on device reproduces the host
    apply_photometric pixels — the --device-pixel-aug path trains on the
    reference's exact augmentation distribution (image_augmentation.py:
    169-198), not a fixed-order approximation."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(6):
            img = rng.integers(0, 255, (70, 90, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            w.append_record(buf.tobytes(),
                            np.asarray([[1, 0.5, 0.5, 0.4, 0.5]], np.float32))

    def load():
        ds = DetectionDataset(RecordReader(d), phase="train",
                              apply_noise=False, apply_photometric=False)
        ld = Loader(ds, 3, [[64, 64]], [0.5] * 3, [1.0] * 3, seed=7,
                    prefetch=0, output_uint8=True, shard_by_process=False)
        return list(ld)

    batches = load()
    for batch in batches:
        assert batch["jitter_op"].shape == (3, 5)
        assert batch["jitter_factor"].shape == (3, 5)
        dev_out = np.asarray(dev.planned_color_jitter(
            jnp.asarray(batch["images"]), jnp.asarray(batch["jitter_op"]),
            jnp.asarray(batch["jitter_factor"])))
        for i in range(3):
            host = host_aug.apply_photometric(
                batch["images"][i].astype(np.float32),
                batch["jitter_op"][i], batch["jitter_factor"][i])
            np.testing.assert_allclose(dev_out[i], host, atol=0.5)
    # some program applies at least one op across the epoch
    assert any((b["jitter_op"] >= 0).any() for b in batches)
    # plan determinism: same seed -> identical programs (resume safety)
    again = load()
    for b1, b2 in zip(batches, again):
        np.testing.assert_array_equal(b1["jitter_op"], b2["jitter_op"])
        np.testing.assert_array_equal(b1["jitter_factor"],
                                      b2["jitter_factor"])


def test_pixel_aug_requires_normalize():
    import pytest

    from mobilenet_yolo_tpu.models import MBv2YOLO
    from mobilenet_yolo_tpu.train import create_train_state, make_train_step

    model = MBv2YOLO(num_classes=2, num_anchors=3, width_mult=0.35)
    _, tx = create_train_state(model, jax.random.PRNGKey(0), (64, 64),
                               learning_rate=1e-3, batch_size=2)
    with pytest.raises(ValueError):
        make_train_step(model, {"yolo": {}}, tx, pixel_aug=True)
