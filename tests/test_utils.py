import os

import numpy as np
import pytest

from mobilenet_yolo_tpu.utils.logger import Logger, LoggerMonitor
from mobilenet_yolo_tpu.utils.meters import AverageMeter, MeterDict, get_mean_and_std
from mobilenet_yolo_tpu.utils.visualize import (
    draw_detections,
    overlay_seg_maps,
    save_image,
)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0, n=3)
    assert m.avg == (1.0 + 9.0) / 4
    assert m.val == 3.0
    m.reset()
    assert m.count == 0


def test_meter_dict():
    md = MeterDict()
    md.update({"a": 1.0, "b": 2.0}, n=2)
    md.update({"a": 3.0}, n=2)
    assert md.averages()["a"] == 2.0
    assert md["b"].avg == 2.0


def test_logger_roundtrip_and_resume(tmp_path):
    path = str(tmp_path / "log.txt")
    lg = Logger(path, title="t")
    lg.set_names(["Epoch", "Loss"])
    lg.append([1, 0.5])
    lg.append([2, 0.25])
    lg.close()

    lg2 = Logger(path, title="t", resume=True)
    assert lg2.names == ["Epoch", "Loss"]
    assert lg2.numbers["Loss"] == [0.5, 0.25]
    lg2.append([3, 0.1])
    lg2.close()
    with open(path) as f:
        assert len(f.readlines()) == 4  # header + 3 rows


def test_logger_savefig(tmp_path):
    path = str(tmp_path / "log.txt")
    lg = Logger(path)
    lg.set_names(["Loss"])
    lg.append([1.0])
    lg.append([0.5])
    out = str(tmp_path / "plot.png")
    lg.savefig(out)
    lg.close()
    assert os.path.getsize(out) > 0


def test_logger_monitor(tmp_path):
    paths = {}
    for run in ("a", "b"):
        p = str(tmp_path / f"{run}.txt")
        lg = Logger(p)
        lg.set_names(["Loss"])
        lg.append([1.0])
        lg.close()
        paths[run] = p
    mon = LoggerMonitor(paths)
    out = str(tmp_path / "overlay.png")
    mon.savefig(out, names=["Loss"])
    assert os.path.getsize(out) > 0


def test_get_mean_and_std():
    imgs = [np.full((4, 4, 3), 0.5, np.float32),
            np.full((4, 4, 3), 1.0, np.float32)]
    mean, std = get_mean_and_std(imgs)
    np.testing.assert_allclose(mean, [0.75] * 3)
    np.testing.assert_allclose(std, [0.25] * 3, atol=1e-7)


def test_draw_and_overlay(tmp_path, rng):
    img = rng.integers(0, 255, (64, 80, 3), np.uint8)
    boxes = np.asarray([[0.1, 0.1, 0.5, 0.5], [0.4, 0.4, 0.9, 0.8]])
    out = draw_detections(img, boxes, labels=[1, 2], scores=[0.9, 0.5],
                          class_names=["bg", "cat", "dog"])
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # something was drawn

    seg = np.zeros((8, 10, 2), np.float32)
    seg[:4, :, 0] = 1.0
    over = overlay_seg_maps(img, seg)
    assert over.shape == img.shape

    p = str(tmp_path / "x.png")
    save_image(p, out)
    assert os.path.getsize(p) > 0


def test_gt_debug_renderer(tmp_path, rng):
    """show_image counterpart: renders augmented pipeline samples (incl.
    mosaic groups) with their GT rows drawn."""
    pytest.importorskip("cv2")
    import cv2

    from mobilenet_yolo_tpu.data.pipeline import DetectionDataset
    from mobilenet_yolo_tpu.data.records import RecordReader, RecordWriter
    from mobilenet_yolo_tpu.utils.visualize import (
        draw_gt_sample, dump_pipeline_samples)

    img = rng.integers(0, 255, (60, 80, 3), np.uint8)
    rows = np.asarray([[1, 0.4, 0.4, 0.3, 0.3, 0.0],
                       [2, 0.7, 0.7, 0.2, 0.2, 1.0]], np.float32)
    out = draw_gt_sample(img, rows, class_names=["bg", "a", "b"])
    assert out.shape == img.shape and not np.array_equal(out, img)

    d = str(tmp_path / "shard")
    with RecordWriter(d) as w:
        for _ in range(4):
            ok, buf = cv2.imencode(".jpg", img)
            w.append_record(buf.tobytes(), rows)
    ds = DetectionDataset(RecordReader(d), phase="train")
    paths = dump_pipeline_samples(ds, [0, 1, 2, 3], str(tmp_path / "prev"),
                                  class_names=["bg", "a", "b"],
                                  mosaic_group=2)
    assert len(paths) == 2
    assert all(os.path.getsize(p) > 0 for p in paths)
