import numpy as np

from mobilenet_yolo_tpu.ops.ap import calculate_mAP, eval_class_ap

CLASSES = ["background", "cat", "dog"]


def test_perfect_detections_map_1():
    true_boxes = [np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]], np.float32)]
    true_labels = [np.array([1, 2])]
    true_diff = [np.zeros(2, np.float32)]
    det_boxes = [true_boxes[0].copy()]
    det_labels = [np.array([1, 2])]
    det_scores = [np.array([0.9, 0.8], np.float32)]
    aps, mAP, tp, fp = calculate_mAP(det_boxes, det_labels, det_scores,
                                     true_boxes, true_labels, true_diff, CLASSES)
    assert mAP == 1.0
    assert aps["cat"] == 1.0 and aps["dog"] == 1.0
    assert tp["cat"] == 1 and fp["cat"] == 0


def test_false_positive_lowers_ap():
    true_boxes = [np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)]
    true_labels = [np.array([1])]
    true_diff = [np.zeros(1, np.float32)]
    # one matching det (lower score) + one disjoint FP (higher score)
    det_boxes = [np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]], np.float32)]
    det_labels = [np.array([1, 1])]
    det_scores = [np.array([0.5, 0.9], np.float32)]
    ap, tp, fp = eval_class_ap(1, true_labels, det_labels, true_boxes,
                               true_diff, det_boxes, det_scores)
    # FP ranked first: precision at recall 1.0 is 1/2; 11-point AP:
    # thresholds 0..1 all need recall>=t; recall reaches 1 at det 2 with
    # precision 0.5 -> AP = mean(0.5 * 11) = 0.5
    np.testing.assert_allclose(ap, 0.5, atol=1e-6)
    assert tp == 1 and fp == 1


def test_duplicate_detection_is_fp():
    true_boxes = [np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)]
    true_labels = [np.array([1])]
    true_diff = [np.zeros(1, np.float32)]
    det_boxes = [np.array([[0.1, 0.1, 0.4, 0.4], [0.11, 0.11, 0.41, 0.41]], np.float32)]
    det_labels = [np.array([1, 1])]
    det_scores = [np.array([0.9, 0.8], np.float32)]
    _, tp, fp = eval_class_ap(1, true_labels, det_labels, true_boxes,
                              true_diff, det_boxes, det_scores)
    assert tp == 1 and fp == 1


def test_difficult_objects_ignored():
    true_boxes = [np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)]
    true_labels = [np.array([1])]
    true_diff = [np.ones(1, np.float32)]  # difficult
    det_boxes = [np.array([[0.1, 0.1, 0.4, 0.4]], np.float32)]
    det_labels = [np.array([1])]
    det_scores = [np.array([0.9], np.float32)]
    ap, tp, fp = eval_class_ap(1, true_labels, det_labels, true_boxes,
                               true_diff, det_boxes, det_scores)
    # matching a difficult object: neither TP nor FP; no easy objects -> AP 0
    assert tp == 0 and fp == 0
    assert ap == 0.0


def test_low_iou_is_fp():
    true_boxes = [np.array([[0.0, 0.0, 0.2, 0.2]], np.float32)]
    true_labels = [np.array([1])]
    true_diff = [np.zeros(1, np.float32)]
    det_boxes = [np.array([[0.15, 0.15, 0.4, 0.4]], np.float32)]  # IoU < 0.5
    det_labels = [np.array([1])]
    det_scores = [np.array([0.9], np.float32)]
    _, tp, fp = eval_class_ap(1, true_labels, det_labels, true_boxes,
                              true_diff, det_boxes, det_scores)
    assert tp == 0 and fp == 1
