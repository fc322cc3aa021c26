"""COCO mAP harness sanity tests (protocol invariants on synthetic data)."""

import numpy as np

from codetr_tpu.utils.coco_eval import average_precision, box_iou, evaluate_detections


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)[0]
    assert iou[0] == 1.0
    assert abs(iou[1] - 25 / 175) < 1e-9
    assert iou[2] == 0.0


def test_perfect_predictions_give_map_1():
    gts = [
        {"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]), "labels": np.array([0, 1])},
        {"boxes": np.array([[5, 5, 15, 15]]), "labels": np.array([0])},
    ]
    preds = [
        {"boxes": g["boxes"], "labels": g["labels"], "scores": np.ones(len(g["labels"]))}
        for g in gts
    ]
    m = evaluate_detections(preds, gts, num_classes=2)
    assert m["mAP"] > 0.99
    assert m["mAP_50"] > 0.99


def test_wrong_predictions_give_map_0():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([0])}]
    preds = [{"boxes": np.array([[50, 50, 60, 60]]), "labels": np.array([0]),
              "scores": np.array([0.9])}]
    m = evaluate_detections(preds, gts, num_classes=1)
    assert m["mAP"] == 0.0


def test_localization_quality_graded_by_iou():
    """A prediction with IoU ~0.6 counts at IoU<=0.6 thresholds only."""
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([0])}]
    preds = [{"boxes": np.array([[0, 0, 10, 7.5]]), "labels": np.array([0]),
              "scores": np.array([0.9])}]  # IoU 0.75
    m = evaluate_detections(preds, gts, num_classes=1)
    assert m["mAP_50"] > 0.99
    assert 0.4 < m["mAP"] < 0.7


def test_duplicate_detections_penalized():
    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([0])}]
    preds = [{
        "boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]]),
        "labels": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
    }]
    m = evaluate_detections(preds, gts, num_classes=1)
    # second detection is a false positive at every threshold
    assert m["mAP_50"] > 0.99  # precision envelope keeps AP at 1.0 until recall 1
    ap = average_precision(np.array([0.9, 0.8]), np.array([True, False]), 1)
    assert ap > 0.99
