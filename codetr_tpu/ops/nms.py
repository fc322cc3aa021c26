"""Fixed-shape non-maximum suppression in pure JAX.

The reference runs torchvision ``batched_nms`` *outside* the compiled graph
(codetr/inferencer.py:22,380-402 and codetr_inference.cpp:83-112) because
TensorRT needs static shapes.  On TPU we get the best of both: this NMS is
itself static-shape (padded with -inf scores), so it can run *inside* the
jitted graph — no host round-trip — while matching torchvision's semantics:

- greedy NMS on score-descending order, IoU computed on (x1,y1,x2,y2) boxes
  with zero-area degenerate handling identical to torchvision.ops.nms;
- ``batched_nms`` keeps classes independent via the coordinate-offset trick
  (boxes of different classes are translated apart so they never overlap).

All outputs are fixed-size: ``keep`` is a boolean mask, not a gathered index
list, so downstream code stays shape-static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU for (N, 4) xyxy boxes -> (N, N)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_mask(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Greedy NMS; returns keep mask aligned with the input order.

    boxes: (N, 4) xyxy; scores: (N,).  Padding entries should carry -inf score.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)  # score-descending
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = _iou_matrix(boxes_s)
    overlap = iou > iou_threshold
    valid = jnp.isfinite(scores_s)

    # Sequential greedy scan: box i survives iff no surviving earlier box
    # overlaps it.  N is small (<= max_per_img, 300) so an O(N) fori_loop over
    # a length-N mask is cheap and static.
    def body(i, keep):
        suppressed_by_earlier = jnp.any(keep & overlap[i] & (jnp.arange(n) < i))
        keep_i = valid[i] & ~suppressed_by_earlier
        return keep.at[i].set(keep_i)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    # scatter back to input order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=())
def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Class-agnostic NMS keep-mask (torchvision.ops.nms parity)."""
    return _nms_mask(boxes, scores, jnp.asarray(iou_threshold, boxes.dtype))


@jax.jit
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    iou_threshold: jax.Array,
) -> jax.Array:
    """Per-class NMS keep-mask (torchvision.ops.batched_nms parity via the
    coordinate offset trick).  boxes (N,4), scores (N,), labels (N,) int."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0))
    offsets = labels.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return _nms_mask(shifted, scores, iou_threshold)


def _soft_nms_scores(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: jax.Array,
    sigma: jax.Array,
    min_score: jax.Array,
    method: str,
) -> jax.Array:
    """Static-shape soft-NMS (Bodla et al.; mmcv.ops.soft_nms semantics —
    the flagship test_cfg is nms=dict(type='soft_nms', iou_threshold=0.8),
    configs/co_dino_5scale_r50_lsj_8xb2_1x_coco.py:255).

    Greedy rescoring: repeatedly select the highest-scoring unprocessed box,
    freeze its current score, and decay the scores of the remaining boxes by
    their overlap with it — ``linear``: 1 - iou for iou > iou_threshold;
    ``gaussian``: exp(-iou^2 / sigma) unconditionally.  Boxes whose decayed
    score falls below ``min_score`` are discarded (-inf).

    Returns final scores aligned with the input order (padding/discarded
    entries -inf); no boxes are removed, so shapes stay static.
    """
    n = boxes.shape[0]
    iou = _iou_matrix(boxes)

    def body(_, carry):
        cur, final, done = carry
        cand = jnp.where(done, -jnp.inf, cur)
        i = jnp.argmax(cand)
        ok = cand[i] >= min_score  # loop is a no-op once nothing survives
        final = jnp.where(ok, final.at[i].set(cand[i]), final)
        done = jnp.where(ok, done.at[i].set(True), done)
        iou_i = iou[i]
        if method == "linear":
            decay = jnp.where(iou_i > iou_threshold, 1.0 - iou_i, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(iou_i * iou_i) / sigma)
        else:
            raise ValueError(f"unknown soft-NMS method {method!r}")
        decay = jnp.where(done, 1.0, decay)
        cur = jnp.where(ok, cur * decay, cur)
        return cur, final, done

    neg_inf = jnp.full((n,), -jnp.inf, scores.dtype)
    _, final, _ = jax.lax.fori_loop(
        0, n, body, (scores, neg_inf, jnp.zeros((n,), bool))
    )
    return final


@partial(jax.jit, static_argnames=("method",))
def soft_nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
) -> jax.Array:
    """Class-agnostic soft-NMS rescoring; returns per-box final scores
    (mmcv.ops.soft_nms defaults)."""
    f = boxes.dtype
    return _soft_nms_scores(
        boxes,
        scores,
        jnp.asarray(iou_threshold, f),
        jnp.asarray(sigma, f),
        jnp.asarray(min_score, f),
        method,
    )


@partial(jax.jit, static_argnames=("method",))
def soft_batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    iou_threshold: jax.Array,
    sigma: jax.Array,
    min_score: jax.Array,
    method: str = "linear",
) -> jax.Array:
    """Per-class soft-NMS via the coordinate-offset trick (the class-wise
    dispatch of mmcv batched_nms with a soft_nms op)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0))
    offsets = labels.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return _soft_nms_scores(shifted, scores, iou_threshold, sigma, min_score, method)


def postprocess_detections(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    *,
    score_threshold: float,
    iou_threshold: float,
    scale_factor=None,
    nms_type: str = "nms",
    nms_sigma: float = 0.5,
    nms_min_score: float = 1e-3,
):
    """Score-threshold + batched (soft-)NMS + rescale, batched over images.

    Mirrors Inferencer.postprocess_predictions (codetr/inferencer.py:380-402)
    for ``nms_type="nms"``; ``"soft_nms"`` / ``"soft_nms_gaussian"`` apply
    the flagship test_cfg's suppression (rescoring — returned scores are the
    decayed ones).  Scores below threshold and suppressed entries get score
    -inf in the returned mask-compatible arrays; boxes are divided by
    scale_factor to map back to original image coordinates.

    boxes (bs,N,4), scores (bs,N), labels (bs,N).
    Returns (boxes, scores, labels, keep_mask) with identical leading shapes.
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    gated = jnp.where(scores >= score_threshold, scores, neg_inf)
    if nms_type == "nms":
        keep = jax.vmap(batched_nms, in_axes=(0, 0, 0, None))(
            boxes, gated, labels, jnp.asarray(iou_threshold, boxes.dtype)
        )
        keep = keep & (gated > neg_inf)
        out_scores = jnp.where(keep, scores, neg_inf)
    elif nms_type in ("soft_nms", "soft_nms_gaussian"):
        method = "gaussian" if nms_type.endswith("gaussian") else "linear"
        f = boxes.dtype
        out_scores = jax.vmap(
            partial(soft_batched_nms, method=method), in_axes=(0, 0, 0, None, None, None)
        )(
            boxes,
            gated,
            labels,
            jnp.asarray(iou_threshold, f),
            jnp.asarray(nms_sigma, f),
            jnp.asarray(nms_min_score, f),
        )
        keep = jnp.isfinite(out_scores)
    else:
        raise ValueError(f"unknown nms_type {nms_type!r}")
    if scale_factor is not None:
        boxes = boxes / jnp.asarray(scale_factor, boxes.dtype)
    return boxes, out_scores, labels, keep
