"""An INDEPENDENT transcription of the pycocotools COCOeval protocol
(bbox iouType), used only by tests to cross-check
``codetr_tpu.utils.coco_eval`` (round-2 VERDICT: the 586-line production
reimplementation was validated only by hand-computed fixtures; pycocotools
itself is not installable in this environment).

This version is deliberately structured like pycocotools' own code —
per-(img, cat) evaluateImg dicts, a global accumulate over concatenated
detections with mergesort tie-breaking, the q/recThrs interpolation loop —
rather than like the production module's per-class streaming layout, so a
protocol mistake in one is unlikely to be reproduced by the other.
Reference: pycocotools/cocoeval.py (COCOeval.evaluateImg, accumulate,
summarize), transcribed from the published algorithm.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DET = 100


def _iou(dt, gt, iscrowd):
    """pycocotools maskUtils.iou for xyxy boxes."""
    out = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        ga = max(g[2] - g[0], 0) * max(g[3] - g[1], 0)
        for i, d in enumerate(dt):
            da = max(d[2] - d[0], 0) * max(d[3] - d[1], 0)
            w = min(d[2], g[2]) - max(d[0], g[0])
            h = min(d[3], g[3]) - max(d[1], g[1])
            inter = max(w, 0) * max(h, 0)
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_crowd, gt_areas, arng):
    """COCOeval.evaluateImg for one (img, cat, areaRng): returns the dict
    pycocotools stores (dtMatches / dtIgnore / dtScores / num non-ignored gt),
    with detections pre-truncated to MAX_DET."""
    T = len(IOU_THRS)
    gt_ignore = gt_crowd | (gt_areas < arng[0]) | (gt_areas > arng[1])
    gtind = np.argsort(gt_ignore, kind="mergesort")
    gt_boxes = gt_boxes[gtind]
    gt_crowd = gt_crowd[gtind]
    gt_ignore = gt_ignore[gtind].astype(float)

    dtind = np.argsort(-dt_scores, kind="mergesort")[:MAX_DET]
    dt_boxes = dt_boxes[dtind]
    dt_scores = dt_scores[dtind]
    D, G = len(dt_boxes), len(gt_boxes)

    ious = _iou(dt_boxes, gt_boxes, gt_crowd) if D and G else np.zeros((D, G))
    gtm = np.zeros((T, G)) - 1
    dtm = np.zeros((T, D)) - 1
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > -1 and not gt_crowd[gind]:
                    continue
                if m > -1 and gt_ignore[m] == 0 and gt_ignore[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ignore[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    # unmatched dets outside the area range are ignored
    a = np.array(
        [
            max(b[2] - b[0], 0) * max(b[3] - b[1], 0) < arng[0]
            or max(b[2] - b[0], 0) * max(b[3] - b[1], 0) > arng[1]
            for b in dt_boxes
        ]
    ).reshape(1, -1)
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == -1, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtIgnore": dt_ig,
        "dtScores": dt_scores,
        "num_gt": int((gt_ignore == 0).sum()),
    }


def evaluate(predictions, ground_truths, num_classes):
    """COCOeval.evaluate + accumulate + summarize for bbox, returning the
    same metric dict keys as codetr_tpu.utils.coco_eval.evaluate_detections."""
    T, R = len(IOU_THRS), len(REC_THRS)
    names = list(AREA_RNGS)
    precision = -np.ones((T, R, num_classes, len(names)))
    recall = -np.ones((T, num_classes, len(names)))

    for k in range(num_classes):
        for a, aname in enumerate(names):
            arng = AREA_RNGS[aname]
            evals = []
            for pred, gt in zip(predictions, ground_truths):
                pm = np.asarray(pred["labels"]) == k
                gm = np.asarray(gt["labels"]) == k
                gb = np.asarray(gt["boxes"], float).reshape(-1, 4)[gm]
                crowd = (
                    np.asarray(gt.get("iscrowd", np.zeros(len(gm), bool)))
                    .astype(bool)[gm]
                )
                if "areas" in gt:
                    ga = np.asarray(gt["areas"], float)[gm]
                else:
                    ga = np.maximum(gb[:, 2] - gb[:, 0], 0) * np.maximum(
                        gb[:, 3] - gb[:, 1], 0
                    )
                evals.append(
                    _evaluate_img(
                        np.asarray(pred["boxes"], float).reshape(-1, 4)[pm],
                        np.asarray(pred["scores"], float)[pm],
                        gb,
                        crowd,
                        ga,
                        arng,
                    )
                )
            # ---- accumulate (pycocotools.cocoeval.accumulate) ----
            dt_scores = np.concatenate([e["dtScores"] for e in evals])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, inds]
            npig = sum(e["num_gt"] for e in evals)
            if npig == 0:
                continue
            tps = np.logical_and(dtm > -1, np.logical_not(dt_ig))
            fps = np.logical_and(dtm == -1, np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(float)
            fp_sum = np.cumsum(fps, axis=1).astype(float)
            for t in range(T):
                tp = tp_sum[t]
                fp = fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros(R)
                recall[t, k, a] = rc[-1] if nd else 0
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds_r = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds_r):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[t, :, k, a] = q

    def summ(ap, iouThr=None, area="all"):
        aind = names.index(area)
        if ap:
            s = precision[:, :, :, aind]
            if iouThr is not None:
                s = s[np.where(np.isclose(IOU_THRS, iouThr))[0]]
        else:
            s = recall[:, :, aind]
            if iouThr is not None:
                s = s[np.where(np.isclose(IOU_THRS, iouThr))[0]]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else 0.0

    return {
        "mAP": summ(True),
        "mAP_50": summ(True, 0.5),
        "mAP_75": summ(True, 0.75),
        "mAP_small": summ(True, area="small"),
        "mAP_medium": summ(True, area="medium"),
        "mAP_large": summ(True, area="large"),
        "AR_100": summ(False),
    }
