"""Data pipeline tests: augmentation invariants, mosaic geometry, record
pipeline end-to-end, grouped batch sampling."""

import numpy as np
import pytest

from mobilenet_yolo_tpu.data import augment
from mobilenet_yolo_tpu.data.mosaic import generate_mosaic_mask, group_indices, mosaic


def _scene(rng, h=120, w=160):
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    boxes = np.asarray([[20, 30, 80, 90], [100, 10, 150, 60]], np.float32)
    labels = np.asarray([1.0, 2.0], np.float32)
    diffs = np.zeros(2, np.float32)
    return img, boxes, labels, diffs


def test_hflip_geometry(rng):
    img, boxes, *_ = _scene(rng)
    out, nb, _ = augment.hflip(img, boxes)
    np.testing.assert_array_equal(out, img[:, ::-1])
    # flipped box of [20,30,80,90] in a 160-wide image: x1=160-80-1, x2=160-20-1
    np.testing.assert_allclose(nb[0], [79, 30, 139, 90])
    assert (nb[:, 0] <= nb[:, 2]).all()


def test_expand_contains_original(rng):
    img, boxes, *_ = _scene(rng)
    out, nb, _ = augment.expand(img, boxes, (0.5, 0.5, 0.5), 2.0, rng)
    assert out.shape[0] >= img.shape[0] and out.shape[1] >= img.shape[1]
    # box sizes preserved
    np.testing.assert_allclose(nb[:, 2] - nb[:, 0], boxes[:, 2] - boxes[:, 0])
    assert (nb >= 0).all()


def test_random_crop_keeps_centered_boxes(rng):
    img, boxes, labels, diffs = _scene(rng)
    out, nb, nl, nd, _ = augment.random_crop(img, boxes, labels, diffs, rng)
    assert out.ndim == 3 and nb.shape[0] == nl.shape[0] == nd.shape[0]
    assert nb.shape[0] >= 1  # at least one box survives (center-keep rule)
    assert (nb[:, :2] >= -1e-5).all()
    assert (nb[:, 2] <= out.shape[1] + 1e-5).all()
    assert (nb[:, 3] <= out.shape[0] + 1e-5).all()


def test_photometric_preserves_shape_dtype(rng):
    img, *_ = _scene(rng)
    out = augment.photometric_distort(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_pixel_noise_preserves_shape(rng):
    img, *_ = _scene(rng)
    out = augment.pixel_noise(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_gaussian_blur_matches_dense_conv(rng):
    img = rng.integers(0, 255, (12, 14, 3), np.uint8)
    sigma = 0.8
    radius = max(1, int(round(3.0 * sigma)))
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k1 = np.exp(-0.5 * (t / sigma) ** 2)
    k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    xp = np.pad(img.astype(np.float64),
                [(radius, radius), (radius, radius), (0, 0)], mode="edge")
    want = np.zeros(img.shape, np.float64)
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            want += k2[dy, dx] * xp[dy:dy + 12, dx:dx + 14]
    got = augment.gaussian_blur(img, sigma)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # sub-epsilon sigma is the identity
    np.testing.assert_array_equal(augment.gaussian_blur(img, 0.0), img)


def test_median_blur_matches_naive(rng):
    img = rng.integers(0, 255, (10, 11, 3), np.uint8)
    for k in (3, 5):
        pad = k // 2
        xp = np.pad(img, [(pad, pad), (pad, pad), (0, 0)], mode="edge")
        want = np.empty(img.shape, np.float32)
        for y in range(10):
            for x in range(11):
                want[y, x] = np.median(
                    xp[y:y + k, x:x + k].reshape(-1, 3), axis=0)
        np.testing.assert_allclose(augment.median_blur(img, k), want)


def test_cv2_and_numpy_filter_paths_agree(rng):
    """The cv2-accelerated filters must match the numpy fallbacks (same
    math, same replicate border)."""
    pytest.importorskip("cv2")
    img = rng.integers(0, 255, (24, 30, 3), np.uint8)

    def numpy_path(fn, *a):
        saved = augment._CV2
        augment._CV2 = None
        try:
            return fn(*a)
        finally:
            augment._CV2 = saved

    augment._try_cv2()  # ensure cv2 is loaded for the fast path
    for sigma in (0.4, 0.9):
        np.testing.assert_allclose(
            augment.gaussian_blur(img, sigma),
            numpy_path(augment.gaussian_blur, img, sigma), atol=2e-3)
    for k in (3, 5):
        np.testing.assert_allclose(
            augment.median_blur(img, k),
            numpy_path(augment.median_blur, img, k), atol=1e-5)
    np.testing.assert_allclose(
        augment.sharpen(img, 0.08, 1.05),
        numpy_path(augment.sharpen, img, 0.08, 1.05), atol=2e-3)
    np.testing.assert_allclose(
        augment.adjust_hue(img.astype(np.float32), 0.07),
        numpy_path(augment.adjust_hue, img.astype(np.float32), 0.07),
        atol=0.05)


def test_sharpen_matches_dense_kernel(rng):
    img = rng.integers(0, 255, (9, 9, 3), np.uint8)
    alpha, light = 0.07, 1.05
    kern = np.full((3, 3), -1.0)
    kern[1, 1] = 8.0 + light
    ident = np.zeros((3, 3))
    ident[1, 1] = 1.0
    blended = (1 - alpha) * ident + alpha * kern
    xp = np.pad(img.astype(np.float64), [(1, 1), (1, 1), (0, 0)], mode="edge")
    want = np.zeros(img.shape, np.float64)
    for dy in range(3):
        for dx in range(3):
            want += blended[dy, dx] * xp[dy:dy + 9, dx:dx + 9]
    got = augment.sharpen(img, alpha, light)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_mosaic_mask_partitions():
    rng = np.random.default_rng(0)
    for num in (1, 2, 3, 4):
        tiles = generate_mosaic_mask(num, (100, 100), rng)
        assert len(tiles) == num
        area = sum((t[2] - t[0]) * (t[3] - t[1]) for t in tiles)
        assert area == 100 * 100  # exact partition


def test_mosaic_composes_labels(rng):
    group = []
    for i in range(4):
        img = rng.integers(0, 255, (100, 100, 3), np.uint8)
        labels = np.asarray([[1 + i, 0.5, 0.5, 0.4, 0.4]], np.float32)
        group.append((img, labels))
    img, labels = mosaic(group, (200, 200), rng)
    assert img.shape == (200, 200, 3)
    assert labels.shape == (4, 5)
    # boxes stay within the unit square
    x1 = labels[:, 1] - labels[:, 3] / 2
    y1 = labels[:, 2] - labels[:, 4] / 2
    assert (x1 >= -1e-5).all() and (y1 >= -1e-5).all()
    assert (labels[:, 1] + labels[:, 3] / 2 <= 1 + 1e-5).all()


def test_group_indices_covers_all():
    rng = np.random.default_rng(0)
    batches = list(group_indices(range(100), 8, [1, 4], rng))
    seen = [i for b in batches for g in b for i in g]
    # a trailing partial mosaic bucket may be dropped (the reference sampler
    # drops it too, CustomBatchSampler.py:54-73)
    assert len(set(seen)) == len(seen)
    assert sorted(seen) == list(range(len(seen)))
    assert len(seen) > 100 - 4
    for b in batches[:-1]:
        assert len(b) == 8
    for b in batches:
        for g in b:
            assert len(g) in (1, 4)


def test_record_pipeline_end_to_end(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(12):
            img = rng.integers(0, 255, (80, 100, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            labels = np.asarray([[1 + i % 3, 0.5, 0.5, 0.4, 0.5]], np.float32)
            w.append_record(buf.tobytes(), labels)

    ds = DetectionDataset(RecordReader(d), phase="train", expand_scale=1.5)
    loader = Loader(ds, batch_size=4, transform_size=[[64, 64], [96, 96]],
                    mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1, 4],
                    max_gt=10, prefetch=0)
    batches = list(loader)
    assert len(batches) >= 1
    for b in batches:
        bsz, h, w_, c = b["images"].shape
        assert (h, w_) in ((64, 64), (96, 96)) and c == 3
        assert b["gt"].shape == (bsz, 10, 5)
        assert (b["n_gt"] >= 0).all()
        assert np.isfinite(b["images"]).all()

    # test phase: deterministic order, no aug
    ds_t = DetectionDataset(RecordReader(d), phase="test")
    loader_t = Loader(ds_t, batch_size=4, transform_size=[[64, 64]],
                      mean=[0.5] * 3, std=[1.0] * 3, shuffle=False, prefetch=0)
    bt = list(loader_t)
    assert sum(b["images"].shape[0] for b in bt) == 12
    assert all(b["n_gt"].max() <= 1 for b in bt)


def test_difficult_flag_end_to_end(tmp_path, rng):
    """Difficulty threads shard -> Loader -> Evaluator -> VOC AP protocol:
    a detection matching a difficult GT is neither TP nor FP, and the
    difficult GT never counts as a missed box (eval_mAP.py:8-67)."""
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter
    from mobilenet_yolo_tpu.eval.evaluator import Evaluator

    d = str(tmp_path / "shard")
    # (cls, cx, cy, w, h, difficult)
    per_image = [
        np.asarray([[1, 0.3, 0.3, 0.2, 0.2, 0.0],
                    [1, 0.7, 0.7, 0.2, 0.2, 1.0]], np.float32),
        np.asarray([[1, 0.5, 0.5, 0.4, 0.4, 0.0]], np.float32),
    ]
    with RecordWriter(d) as w:
        for labels in per_image:
            img = rng.integers(0, 255, (80, 80, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            w.append_record(buf.tobytes(), labels)

    ds = DetectionDataset(RecordReader(d), phase="test")
    loader = Loader(ds, batch_size=2, transform_size=[[64, 64]],
                    mean=[0.5] * 3, std=[1.0] * 3, shuffle=False, prefetch=0,
                    max_gt=4)
    batch = next(iter(loader))
    np.testing.assert_allclose(batch["gt_difficult"][0, :2], [0.0, 1.0])
    np.testing.assert_allclose(batch["gt_difficult"][1, :1], [0.0])

    # fabricate detections that hit every GT box exactly (cls_idx 0 -> label 1)
    def det_rows(labels):
        cx, cy, w, h = labels[:, 1], labels[:, 2], labels[:, 3], labels[:, 4]
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        return np.concatenate(
            [boxes, np.full((len(boxes), 1), 0.9, np.float32),
             np.full((len(boxes), 1), 0.9, np.float32),
             np.zeros((len(boxes), 1), np.float32)], -1)

    K = 4
    dets = np.zeros((2, K, 7), np.float32)
    keep = np.zeros((2, K), bool)
    for b, labels in enumerate(per_image):
        rows = det_rows(labels)
        dets[b, :len(rows)] = rows
        keep[b, :len(rows)] = True

    ev = Evaluator(["background", "c1"])
    ev.add_batch(dets, keep, batch["gt"], batch["n_gt"],
                 difficulties=batch["gt_difficult"])
    aps, mAP, tp, fp = ev.compute()
    # 2 easy GT both matched -> recall 1, precision 1 at every threshold;
    # the difficult match is ignored (no FP) -> AP exactly 1.0. If the flag
    # were dropped, max recall would be 2/3 and AP < 1.
    assert mAP == pytest.approx(1.0)
    assert tp["c1"] == 2 and fp["c1"] == 0


def test_uint8_loader_matches_float_loader(tmp_path, rng):
    """output_uint8 batches, normalized on 'device' with the config's
    mean/std, must equal the host-normalized float batches."""
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

    mean, std = [0.45, 0.5, 0.55], [0.9, 1.0, 1.1]

    def batches(uint8):
        ds = DetectionDataset(RecordReader(d), phase="test")
        ld = Loader(ds, 3, [[64, 64]], mean, std, shuffle=False, prefetch=0,
                    output_uint8=uint8, shard_by_process=False)
        return list(ld)

    f_batches = batches(False)
    u_batches = batches(True)
    assert len(f_batches) == len(u_batches)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    for fb, ub in zip(f_batches, u_batches):
        assert ub["images"].dtype == np.uint8
        devnorm = (ub["images"].astype(np.float32) / 255.0 - m) / s
        np.testing.assert_allclose(fb["images"], devnorm, atol=1e-5)
        np.testing.assert_allclose(fb["gt"], ub["gt"])


def test_seg_rasterization(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    seg = np.zeros((80, 100), np.uint8)
    seg[:40, :] = 1
    seg[40:, :] = 2
    seg_bgr = np.repeat(seg[..., None], 3, -1)
    with RecordWriter(d) as w:
        img = rng.integers(0, 255, (80, 100, 3), np.uint8)
        ok, jbuf = cv2.imencode(".jpg", img)
        ok, sbuf = cv2.imencode(".png", seg_bgr)
        w.append_record(jbuf.tobytes(),
                        np.asarray([[1, 0.5, 0.5, 0.5, 0.5]], np.float32),
                        sbuf.tobytes())
    ds = DetectionDataset(RecordReader(d), phase="test", has_seg=True,
                          seg_num_classes=2)
    loader = Loader(ds, 1, [[64, 64]], [0.5] * 3, [1.0] * 3, prefetch=0)
    b = next(iter(loader))
    assert b["seg_maps"].shape == (1, 4, 4, 2)
    # top half class 1, bottom half class 2
    assert b["seg_maps"][0, 0, 0, 0] > 0.9
    assert b["seg_maps"][0, 3, 0, 1] > 0.9


def test_grain_loader_matches_contract(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("grain")
    from mobilenet_yolo_tpu.data.grain_pipeline import GrainLoader
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(10):
            img = rng.integers(0, 255, (60, 80, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            labels = np.asarray([[1 + i % 2, 0.5, 0.5, 0.4, 0.5]], np.float32)
            w.append_record(buf.tobytes(), labels)

    ds = DetectionDataset(RecordReader(d), phase="train", apply_noise=False)
    loader = GrainLoader(ds, batch_size=4, transform_size=[[64, 64]],
                         mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1, 2],
                         max_gt=8, prefetch=0)
    batches = list(loader)
    assert batches, "grain loader yielded nothing"
    for b in batches:
        assert b["images"].shape == (4, 64, 64, 3)
        assert b["gt"].shape == (4, 8, 5)
        assert np.isfinite(b["images"]).all()


def test_record_reader_pickles_across_processes(tmp_path, rng):
    """The native reader's ctypes handles must not cross process
    boundaries; pickling serializes (directory, mode) and reopens."""
    import pickle

    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    labels = np.asarray([[1, 0.5, 0.5, 0.4, 0.5, 0.0]], np.float32)
    with RecordWriter(d) as w:
        for _ in range(4):
            w.append_record(b"payload", labels)

    r = RecordReader(d)
    r2 = pickle.loads(pickle.dumps(r))
    assert len(r2) == 4
    np.testing.assert_allclose(r2[1].labels, labels)

    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    with ctx.Pool(1) as pool:
        n = pool.apply(_read_len, (r,))
    assert n == 4


def _read_len(reader):
    rec = reader[0]
    assert rec.image_bytes == b"payload"
    return len(reader)


def test_grain_loader_mp_workers(tmp_path, rng):
    """grain num_workers>0: the Loader (holding a native RecordReader)
    is shipped to worker processes and must produce the same batches as
    the in-process path."""
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("grain")
    from mobilenet_yolo_tpu.data.grain_pipeline import GrainLoader
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(8):
            img = rng.integers(0, 255, (60, 80, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            labels = np.asarray([[1 + i % 2, 0.5, 0.5, 0.4, 0.5]], np.float32)
            w.append_record(buf.tobytes(), labels)

    def make_loader(num_workers):
        ds = DetectionDataset(RecordReader(d), phase="train",
                              apply_noise=False)
        return GrainLoader(ds, batch_size=4, transform_size=[[64, 64]],
                           mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1],
                           max_gt=8, prefetch=0, num_workers=num_workers,
                           shard_by_process=False)

    got = list(make_loader(num_workers=2))
    want = list(make_loader(num_workers=0))
    assert len(got) == len(want) > 0
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(g["images"], w_["images"])
        np.testing.assert_allclose(g["gt"], w_["gt"])


def test_multi_host_sharded_plan(tmp_path, rng):
    """Simulated multi-host sharding: each host yields its shard of the
    SAME global batch — equal step counts, matching (H, W) per step, and
    complementary sample coverage."""
    cv2 = pytest.importorskip("cv2")
    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset, Loader
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for i in range(26):
            img = rng.integers(0, 255, (40, 50, 3), np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            w.append_record(buf.tobytes(),
                            np.asarray([[1, 0.5, 0.5, 0.4, 0.5]], np.float32))

    def host_loader(p_idx, n_proc):
        ds = DetectionDataset(RecordReader(d), phase="train",
                              apply_noise=False)
        loader = Loader(ds, batch_size=4,
                        transform_size=[[32, 32], [64, 64]],
                        mean=[0.5] * 3, std=[1.0] * 3, mosaic_num=[1],
                        max_gt=4, prefetch=0, shard_by_process=True)
        loader._process_slice = lambda: (p_idx, n_proc)
        loader.epoch = 1  # fixed epoch => identical plan across "hosts"
        return loader, list(loader._epoch_batches())

    l0, b0 = host_loader(0, 2)
    l1, b1 = host_loader(1, 2)
    full_loader, bfull = host_loader(0, 1)

    assert len(b0) == len(b1) == len(bfull) > 0   # lockstep step counts
    for a, b, f in zip(b0, b1, bfull):
        # same planned (H, W) at every step; each host holds half the batch
        assert a["images"].shape == b["images"].shape
        assert a["images"].shape[0] == 2 and f["images"].shape[0] == 4
        assert a["images"].shape[1:] == f["images"].shape[1:]
    assert len(l0) == 13                           # per-host share of 26
