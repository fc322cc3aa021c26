"""Co-DINO training losses: Hungarian matching + QFL / L1 / GIoU.

The reference repo ships no trainer, but its config defines the full query-
head training recipe (configs/co_dino_5scale_r50_lsj_8xb2_1x_coco.py):

- assigner: HungarianAssigner with FocalLossCost(weight=2),
  BBoxL1Cost(weight=5, box_format='xywh'), IoUCost(giou, weight=2)  (:197-204)
- loss_cls: QualityFocalLoss(use_sigmoid=True, beta=2, weight=1)     (:107-111)
- loss_bbox: L1Loss(weight=5); loss_iou: GIoULoss(weight=2)          (:112-113)

TPU-first design: everything static-shape.  Ground truth arrives padded to a
fixed ``max_gt`` with a validity mask; the assignment runs
``optax.assignment.hungarian_algorithm`` on a (max_gt, num_query) cost matrix
(invalid rows carry a flat cost and are masked out of the losses afterwards).
Aux supervision covers every decoder layer plus the encoder stage, like
mmdet's ``loss_by_feat`` over all_layers_outputs (+ enc outputs).

The reference-side aux heads (RPN/RoI/ATSS collaborative heads) exist only
for training in upstream mmdet and are outside this repo's scope (the
reference's CoDETR class never builds them for inference, codetr.py:51-64).
Denoising (CDN) queries are likewise not implemented.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

INVALID_COST = 1e6


def cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def iou_aligned(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Elementwise IoU of aligned (…, 4) xyxy boxes."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.maximum(boxes1[..., 2] - boxes1[..., 0], 0) * jnp.maximum(
        boxes1[..., 3] - boxes1[..., 1], 0
    )
    a2 = jnp.maximum(boxes2[..., 2] - boxes2[..., 0], 0) * jnp.maximum(
        boxes2[..., 3] - boxes2[..., 1], 0
    )
    return inter / jnp.maximum(a1 + a2 - inter, 1e-9)


def giou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise-free GIoU of aligned (…, 4) xyxy boxes."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.maximum(boxes1[..., 2] - boxes1[..., 0], 0) * jnp.maximum(
        boxes1[..., 3] - boxes1[..., 1], 0
    )
    a2 = jnp.maximum(boxes2[..., 2] - boxes2[..., 0], 0) * jnp.maximum(
        boxes2[..., 3] - boxes2[..., 1], 0
    )
    union = a1 + a2 - inter
    iou = inter / jnp.maximum(union, 1e-9)
    elt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    erb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    ewh = jnp.maximum(erb - elt, 0.0)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], 1e-9)
    return iou - (enclose - union) / enclose


def giou_matrix(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """(N,4) x (M,4) xyxy -> (N,M) GIoU."""
    return giou(boxes1[:, None, :], boxes2[None, :, :])


def _focal_cost(cls_prob: jax.Array, gt_labels: jax.Array,
                alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """mmdet FocalLossCost: (nq, ncls) probs, (max_gt,) labels -> (nq, max_gt)."""
    eps = 1e-12
    neg = -jnp.log(1 - cls_prob + eps) * (1 - alpha) * cls_prob**gamma
    pos = -jnp.log(cls_prob + eps) * alpha * (1 - cls_prob) ** gamma
    return pos[:, gt_labels] - neg[:, gt_labels]


def hungarian_match(
    cls_logits: jax.Array,  # (nq, ncls)
    pred_cxcywh: jax.Array,  # (nq, 4) normalized
    gt_cxcywh: jax.Array,  # (max_gt, 4) normalized, padded
    gt_labels: jax.Array,  # (max_gt,) int, padded
    gt_valid: jax.Array,  # (max_gt,) bool
    *,
    cost_cls: float = 2.0,
    cost_bbox: float = 5.0,
    cost_iou: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Per-image Hungarian assignment (reference config :197-204).

    Returns (matched_pred_idx (max_gt,), match_valid (max_gt,)): for each
    (padded) gt, the index of its assigned query; invalid gts get an
    arbitrary assignment with match_valid False.
    """
    prob = jax.nn.sigmoid(cls_logits)
    c_cls = _focal_cost(prob, gt_labels)  # (nq, max_gt)
    c_l1 = jnp.sum(
        jnp.abs(pred_cxcywh[:, None, :] - gt_cxcywh[None, :, :]), axis=-1
    )  # BBoxL1Cost, box_format='xywh' (normalized cxcywh)
    c_giou = -giou_matrix(cxcywh_to_xyxy(pred_cxcywh), cxcywh_to_xyxy(gt_cxcywh))
    cost = cost_cls * c_cls + cost_bbox * c_l1 + cost_iou * c_giou  # (nq, max_gt)
    cost = jnp.where(gt_valid[None, :], cost, INVALID_COST)
    # rows = gts (max_gt <= nq): hungarian returns one query per gt
    gt_idx, pred_idx = optax.assignment.hungarian_algorithm(cost.T)
    # optax may permute rows; scatter back so entry g corresponds to gt g
    matched = jnp.zeros((gt_cxcywh.shape[0],), pred_idx.dtype).at[gt_idx].set(pred_idx)
    return matched, gt_valid


def quality_focal_loss(
    cls_logits: jax.Array,  # (nq, ncls)
    matched_idx: jax.Array,  # (max_gt,)
    gt_labels: jax.Array,  # (max_gt,)
    quality: jax.Array,  # (max_gt,) IoU of matched pred vs gt, detached
    match_valid: jax.Array,  # (max_gt,)
    beta: float = 2.0,
) -> jax.Array:
    """QualityFocalLoss(use_sigmoid=True, beta=2) (reference config :107-111):
    negatives weighted by sigmoid(p)^beta toward 0; each matched (query,
    label) entry supervised toward its IoU quality with |q - p|^beta scaling.
    Returns the summed loss (caller divides by avg_factor)."""
    p = jax.nn.sigmoid(cls_logits)
    # negative part for every entry
    bce_neg = jnp.maximum(cls_logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    loss = p**beta * bce_neg  # (nq, ncls)

    # positive replacement at (matched_idx, gt_label)
    q = jnp.where(match_valid, quality, 0.0)
    logit_pos = cls_logits[matched_idx, gt_labels]  # (max_gt,)
    p_pos = jax.nn.sigmoid(logit_pos)
    bce_q = (
        jnp.maximum(logit_pos, 0)
        - logit_pos * q
        + jnp.log1p(jnp.exp(-jnp.abs(logit_pos)))
    )
    pos_loss = jnp.abs(q - p_pos) ** beta * bce_q
    neg_at_pos = loss[matched_idx, gt_labels]
    delta = jnp.where(match_valid, pos_loss - neg_at_pos, 0.0)
    return jnp.sum(loss) + jnp.sum(delta)


def _stage_loss(cls_logits, pred_coords, gt_boxes, gt_labels, gt_valid):
    """Losses of one supervised stage for one image."""
    matched, valid = hungarian_match(
        cls_logits, pred_coords, gt_boxes, gt_labels, gt_valid
    )
    pred_at = pred_coords[matched]  # (max_gt, 4)
    pred_xyxy = cxcywh_to_xyxy(pred_at)
    gt_xyxy = cxcywh_to_xyxy(gt_boxes)
    g = giou(pred_xyxy, gt_xyxy)
    iou_q = jax.lax.stop_gradient(iou_aligned(pred_xyxy, gt_xyxy))
    loss_cls = quality_focal_loss(cls_logits, matched, gt_labels, iou_q, valid)
    vf = valid.astype(jnp.float32)
    loss_l1 = jnp.sum(jnp.abs(pred_at - gt_boxes).sum(-1) * vf)
    loss_giou = jnp.sum((1.0 - g) * vf)
    num_pos = jnp.sum(vf)
    return loss_cls, loss_l1, loss_giou, num_pos


def dino_detection_loss(
    outputs: Dict[str, jax.Array],
    gt_boxes: jax.Array,  # (bs, max_gt, 4) normalized cxcywh
    gt_labels: jax.Array,  # (bs, max_gt) int32
    gt_valid: jax.Array,  # (bs, max_gt) bool
    *,
    w_cls: float = 1.0,
    w_bbox: float = 5.0,
    w_iou: float = 2.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss over all decoder layers + the encoder stage (the aux
    supervision pattern of mmdet DINO loss_by_feat)."""
    stage_fn = jax.vmap(_stage_loss, in_axes=(0, 0, 0, 0, 0))

    all_cls = outputs["all_cls_logits"]  # (nl, bs, nq, ncls)
    all_coords = outputs["all_coords"]  # (nl, bs, nq, 4)
    nl = all_cls.shape[0]
    stages = [(all_cls[i], all_coords[i]) for i in range(nl)]
    stages.append((outputs["enc_cls_logits"], outputs["enc_coords"]))

    total = jnp.float32(0.0)
    logs = {}
    for si, (cl, co) in enumerate(stages):
        lc, l1, lg, npos = stage_fn(cl, co, gt_boxes, gt_labels, gt_valid)
        denom = jnp.maximum(jnp.sum(npos), 1.0)
        lc = jnp.sum(lc) / denom
        l1 = jnp.sum(l1) / denom
        lg = jnp.sum(lg) / denom
        stage_total = w_cls * lc + w_bbox * l1 + w_iou * lg
        total = total + stage_total
        name = f"d{si}" if si < nl else "enc"
        logs[f"loss_cls_{name}"] = lc
        logs[f"loss_bbox_{name}"] = l1
        logs[f"loss_iou_{name}"] = lg
    return total, logs
