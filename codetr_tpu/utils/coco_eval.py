"""COCO-style detection mAP evaluation (numpy, dependency-free).

The reference defers evaluation to mmdet's COCO metric (config
val_evaluator=dict(metric='bbox'), co_dino_5scale_r50_lsj:331); pycocotools
is not available in this image, so the standard COCOeval bbox protocol is
re-implemented here: 101-point interpolated AP averaged over IoU thresholds
0.50:0.95:0.05 and over classes, with per-image greedy matching in descending
score order and ignore-free ground truth.

Inputs are plain arrays; the Inferencer's Detections plug in directly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) xyxy -> (N,M) IoU."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def _match_image(det_boxes, det_scores, gt_boxes, iou_thr):
    """Greedy match in score order; returns tp flags aligned to score-sorted
    detections."""
    order = np.argsort(-det_scores, kind="stable")
    tp = np.zeros(len(order), bool)
    taken = np.zeros(len(gt_boxes), bool)
    if len(gt_boxes):
        ious = box_iou(det_boxes[order], gt_boxes)
        for i in range(len(order)):
            j = -1
            best = iou_thr
            for g in range(len(gt_boxes)):
                if not taken[g] and ious[i, g] >= best:
                    best = ious[i, g]
                    j = g
            if j >= 0:
                taken[j] = True
                tp[i] = True
    return tp, order


def average_precision(scores, tp, n_gt) -> float:
    """101-point interpolated AP (COCOeval protocol)."""
    if n_gt == 0:
        return np.nan
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    fp = ~tp
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-9)
    # precision envelope
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    prec_at[idx >= len(precision)] = 0.0
    return float(prec_at.mean())


def evaluate_detections(
    predictions: Sequence[dict],
    ground_truths: Sequence[dict],
    num_classes: int,
) -> Dict[str, float]:
    """predictions/ground_truths: per image dicts with 'boxes' (N,4) xyxy,
    'labels' (N,), and for predictions 'scores' (N,).

    Returns {'mAP', 'mAP_50', 'mAP_75'} (box AP averaged over classes)."""
    assert len(predictions) == len(ground_truths)
    ap = np.full((len(IOU_THRESHOLDS), num_classes), np.nan)
    for ci in range(num_classes):
        n_gt = sum(int((np.asarray(g["labels"]) == ci).sum()) for g in ground_truths)
        for ti, thr in enumerate(IOU_THRESHOLDS):
            all_scores: List[np.ndarray] = []
            all_tp: List[np.ndarray] = []
            for pred, gt in zip(predictions, ground_truths):
                pm = np.asarray(pred["labels"]) == ci
                gm = np.asarray(gt["labels"]) == ci
                det_boxes = np.asarray(pred["boxes"], np.float64)[pm]
                det_scores = np.asarray(pred["scores"], np.float64)[pm]
                gt_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[gm]
                tp, order = _match_image(det_boxes, det_scores, gt_boxes, thr)
                all_scores.append(det_scores[order])
                all_tp.append(tp)
            if n_gt == 0:
                continue
            scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
            tps = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
            ap[ti, ci] = average_precision(scores, tps, n_gt)

    valid = ~np.isnan(ap)
    m_all = float(np.nanmean(ap)) if valid.any() else 0.0
    return {
        "mAP": m_all,
        "mAP_50": float(np.nanmean(ap[0])) if valid[0].any() else 0.0,
        "mAP_75": float(np.nanmean(ap[5])) if valid[5].any() else 0.0,
    }


def load_coco_annotations(json_path: str) -> Dict[int, dict]:
    """COCO instances json -> {image_id: {'file_name', 'boxes', 'labels'}}.
    Category ids are densified to contiguous [0, C) in COCO order."""
    import json

    with open(json_path) as f:
        coco = json.load(f)
    cat_ids = sorted(c["id"] for c in coco["categories"])
    cat_map = {cid: i for i, cid in enumerate(cat_ids)}
    images = {
        im["id"]: {"file_name": im["file_name"], "boxes": [], "labels": []}
        for im in coco["images"]
    }
    for ann in coco.get("annotations", []):
        if ann.get("iscrowd", 0):
            continue
        x, y, w, h = ann["bbox"]
        img = images[ann["image_id"]]
        img["boxes"].append([x, y, x + w, y + h])
        img["labels"].append(cat_map[ann["category_id"]])
    for im in images.values():
        im["boxes"] = np.asarray(im["boxes"], np.float64).reshape(-1, 4)
        im["labels"] = np.asarray(im["labels"], np.int64)
    return images
