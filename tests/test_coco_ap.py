"""COCO-protocol AP tests (ops/coco_ap.py) — hand-computed oracles.

pycocotools is not installed here, so the cases below are worked by hand
against its published algorithm (cocoeval.py evaluateImg/accumulate):
101-point interpolation, monotone precision envelope, greedy best-IoU
matching with ignore preference, per-class skip when no ground truth.
"""

import numpy as np
import pytest

from mobilenet_yolo_tpu.ops.coco_ap import calculate_coco_map

CLASSES = ["background", "cat", "dog"]


def _one_image(dets, gts, diffs=None):
    """dets: list of (box, label, score); gts: list of (box, label)."""
    db = np.array([d[0] for d in dets], np.float32).reshape(-1, 4)
    dl = np.array([d[1] for d in dets], np.int64)
    ds = np.array([d[2] for d in dets], np.float32)
    tb = np.array([g[0] for g in gts], np.float32).reshape(-1, 4)
    tl = np.array([g[1] for g in gts], np.int64)
    td = np.array(diffs if diffs is not None else [0] * len(gts),
                  np.float32)
    return [db], [dl], [ds], [tb], [tl], [td]


def test_perfect_detection_is_ap_1():
    """One GT, one exact detection: precision 1 at every recall point and
    IoU threshold -> AP = AP50 = AP75 = 1."""
    box = [0.1, 0.1, 0.5, 0.5]
    args = _one_image([(box, 1, 0.9)], [(box, 1)])
    res = calculate_coco_map(*args, CLASSES)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(1.0)
    assert res["per_class"] == {"cat": pytest.approx(1.0)}


def test_iou_sweep_cuts_off_at_threshold():
    """A detection with IoU ~0.6 vs its GT is a TP at t in {.5, .55, .6}
    and an FP above -> AP50 = 1, AP75 = 0, AP = 3/10 (one GT: precision
    envelope is 1 for matched thresholds, 0 otherwise)."""
    gt = [0.0, 0.0, 1.0, 1.0]
    det = [0.0, 0.0, 1.0, 0.6]          # IoU exactly 0.6
    args = _one_image([(det, 1, 0.9)], [(gt, 1)])
    res = calculate_coco_map(*args, CLASSES)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert res["AP"] == pytest.approx(3 / 10)


def test_hand_computed_precision_envelope():
    """2 GTs, 3 detections scored [.9 TP, .8 FP, .7 TP] at IoU > .95:
    cum precision [1, 1/2, 2/3], envelope [1, 2/3, 2/3], recall
    [1/2, 1/2, 1]. 101-point AP = (51*1 + 50*(2/3)) / 101."""
    g1 = [0.0, 0.0, 0.2, 0.2]
    g2 = [0.5, 0.5, 0.8, 0.8]
    far = [0.9, 0.9, 1.0, 1.0]
    args = _one_image(
        [(g1, 1, 0.9), (far, 1, 0.8), (g2, 1, 0.7)],
        [(g1, 1), (g2, 1)])
    res = calculate_coco_map(*args, CLASSES)
    want = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert res["AP"] == pytest.approx(want)
    assert res["AP50"] == pytest.approx(want)


def test_difficult_gt_is_ignore():
    """A detection matching only a difficult GT is unscored (not FP), and
    the difficult GT doesn't count in the recall denominator: the easy GT's
    exact detection alone gives AP 1. An unmatched extra det is still FP."""
    easy = [0.0, 0.0, 0.3, 0.3]
    hard = [0.6, 0.6, 0.9, 0.9]
    args = _one_image(
        [(easy, 1, 0.9), (hard, 1, 0.8)],
        [(easy, 1), (hard, 1)], diffs=[0, 1])
    res = calculate_coco_map(*args, CLASSES)
    assert res["AP"] == pytest.approx(1.0)

    # same, but the second det matches nothing at all -> FP after the TP:
    # precision [1, 1/2] -> envelope [1, 1/2], recall hits 1 at rank 1 ->
    # all 101 points read the envelope at the first recall>=p index = 1.0
    nowhere = [0.6, 0.0, 0.9, 0.3]
    args = _one_image(
        [(easy, 1, 0.9), (nowhere, 1, 0.8)],
        [(easy, 1), (hard, 1)], diffs=[0, 1])
    res = calculate_coco_map(*args, CLASSES)
    assert res["AP"] == pytest.approx(1.0)

    # FP scored ABOVE the TP: precision [0, 1/2], envelope [1/2, 1/2],
    # recall [0, 1] -> AP = mean of 101 points all reading 1/2
    args = _one_image(
        [(easy, 1, 0.7), (nowhere, 1, 0.8)],
        [(easy, 1), (hard, 1)], diffs=[0, 1])
    res = calculate_coco_map(*args, CLASSES)
    assert res["AP"] == pytest.approx(0.5)


def test_ignored_gt_not_preferred_over_easy():
    """pycocotools: a detection overlapping BOTH an easy and a difficult GT
    takes the easy one even when the difficult IoU is higher (ignored GTs
    sort last and cannot displace a found non-ignored match)."""
    easy = [0.0, 0.0, 1.0, 0.6]          # IoU 0.6/0.9 = 2/3 with det
    hard = [0.0, 0.0, 1.0, 0.9]          # IoU 1.0 with det
    det = [0.0, 0.0, 1.0, 0.9]
    args = _one_image([(det, 1, 0.9)], [(easy, 1), (hard, 1)],
                      diffs=[0, 1])
    res = calculate_coco_map(*args, CLASSES)
    # matched the easy GT for t <= 2/3 -> TP at {.5,.55,.6,.65}; above,
    # the easy GT is out of reach but the IGNORED one still absorbs the
    # det (unscored) -> no FP, no TP, recall 0, AP contribution 0
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP"] == pytest.approx(4 / 10)


def test_absent_class_skipped_not_zeroed():
    """A class with no GT anywhere is excluded from the mean (pycocotools
    -1 convention), so a perfect 'cat' alone still averages to 1."""
    box = [0.1, 0.1, 0.5, 0.5]
    args = _one_image([(box, 1, 0.9)], [(box, 1)])
    res = calculate_coco_map(*args, CLASSES)
    assert "dog" not in res["per_class"]
    assert res["AP"] == pytest.approx(1.0)


def test_max_dets_cap():
    """Only the top-N scored detections per image are scored: with
    max_dets=1, the lower-scored true positive is dropped -> recall caps
    at 1/2 (envelope 1 up to .5): AP = 51/101."""
    g1 = [0.0, 0.0, 0.2, 0.2]
    g2 = [0.5, 0.5, 0.8, 0.8]
    args = _one_image([(g1, 1, 0.9), (g2, 1, 0.7)], [(g1, 1), (g2, 1)])
    res = calculate_coco_map(*args, CLASSES, max_dets=1)
    assert res["AP"] == pytest.approx(51 / 101)


def test_area_range_aps_partition():
    """Three perfect detections of a small (20x20 px at the 100x100 eval
    frame = 400 px^2 < 32^2), a medium (50x50 = 2500 px^2) and a large
    (98x98 = 9604 px^2 > 96^2) GT: every range-AP is 1 — each range sees
    only its own GT (others ignored) and the off-range detections match
    those ignored GTs, so they are unscored rather than FPs."""
    small = [0.0, 0.0, 0.2, 0.2]
    medium = [0.3, 0.3, 0.8, 0.8]
    large = [0.005, 0.005, 0.985, 0.985]
    args = _one_image(
        [(small, 1, 0.9), (medium, 1, 0.8), (large, 1, 0.7)],
        [(small, 1), (medium, 1), (large, 1)])
    res = calculate_coco_map(*args, CLASSES, img_size=(100, 100))
    for key in ("AP", "APsmall", "APmedium", "APlarge"):
        assert res[key] == pytest.approx(1.0), key


def test_area_range_unmatched_out_of_range_det_not_fp():
    """A small unmatched detection (10x10 px) scored ABOVE a perfect
    large TP: the all-range AP takes the FP hit (envelope 1/2) but
    APlarge stays 1 — an unmatched detection outside the range is
    unscored (cocoeval.py's final dtIg line) — and APsmall is -1 (no
    small GT anywhere)."""
    large = [0.0, 0.0, 0.98, 0.98]
    tiny_fp = [0.0, 0.0, 0.1, 0.1]
    args = _one_image(
        [(large, 1, 0.7), (tiny_fp, 1, 0.95)], [(large, 1)])
    res = calculate_coco_map(*args, CLASSES, img_size=(100, 100))
    assert res["AP"] == pytest.approx(0.5)
    assert res["APlarge"] == pytest.approx(1.0)
    assert res["APsmall"] == -1.0
    assert res["APmedium"] == -1.0


def test_area_range_ignored_gt_absorbs_det():
    """A medium GT evaluated under the small range is ignored; its exact
    detection matches the ignored GT and is unscored — with no in-range
    GT the class is skipped, so APsmall reports -1 rather than charging
    an FP."""
    medium = [0.3, 0.3, 0.8, 0.8]
    args = _one_image([(medium, 1, 0.9)], [(medium, 1)])
    res = calculate_coco_map(*args, CLASSES, img_size=(100, 100))
    assert res["APmedium"] == pytest.approx(1.0)
    assert res["APsmall"] == -1.0
    assert res["APlarge"] == -1.0


def test_area_ranges_skipped_without_img_size():
    box = [0.1, 0.1, 0.5, 0.5]
    args = _one_image([(box, 1, 0.9)], [(box, 1)])
    res = calculate_coco_map(*args, CLASSES)
    assert res["AP"] == pytest.approx(1.0)
    assert res["APsmall"] == -1.0


def test_evaluator_compute_coco_end_to_end():
    """Evaluator.add_batch -> compute_coco plumbing (fixed-K padded dets,
    difficult flags threaded)."""
    from mobilenet_yolo_tpu.eval.evaluator import Evaluator

    ev = Evaluator(CLASSES)
    K = 4
    dets = np.zeros((1, K, 7), np.float32)
    # det matching the GT exactly: (x1,y1,x2,y2, obj, cls, label-1)
    dets[0, 0] = [0.3, 0.3, 0.7, 0.7, 0.9, 1.0, 0.0]
    keep = np.zeros((1, K), bool)
    keep[0, 0] = True
    gt = np.zeros((1, 3, 5), np.float32)
    gt[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]      # label cat, cx cy w h
    ev.add_batch(dets, keep, gt, np.array([1]),
                 difficulties=np.zeros((1, 3), np.float32))
    res = ev.compute_coco()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP75"] == pytest.approx(1.0, abs=1e-6)
