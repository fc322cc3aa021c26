"""NMS parity vs torchvision-free torch oracle.

torchvision is unavailable in this image, so the oracle is a direct greedy
implementation in numpy following the documented torchvision.ops.nms contract
(which the reference relies on at codetr/inferencer.py:22,396)."""

import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.ops.nms import batched_nms, nms, postprocess_detections


def np_nms(boxes, scores, iou_threshold):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        union = area[i] + area - inter
        iou = np.where(union > 0, inter / union, 0)
        suppressed |= iou > iou_threshold
        suppressed[i] = True  # kept, but no longer a candidate
    mask = np.zeros(len(boxes), dtype=bool)
    mask[keep] = True
    return mask


def random_boxes(rng, n, extent=100.0):
    ctr = rng.uniform(0, extent, (n, 2))
    wh = rng.uniform(1, extent / 4, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("iou_thr", [0.3, 0.5, 0.8])
def test_nms_matches_numpy_oracle(seed, iou_thr):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, 64)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    got = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), iou_thr))
    want = np_nms(boxes, scores, iou_thr)
    np.testing.assert_array_equal(got, want)


def test_batched_nms_classes_independent():
    rng = np.random.default_rng(3)
    boxes = np.tile(random_boxes(rng, 8), (2, 1))  # identical boxes, two classes
    scores = rng.uniform(0, 1, 16).astype(np.float32)
    labels = np.repeat(np.array([0, 1]), 8)
    keep = np.asarray(
        batched_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), jnp.float32(0.5))
    )
    k0 = np_nms(boxes[:8], scores[:8], 0.5)
    k1 = np_nms(boxes[8:], scores[8:], 0.5)
    np.testing.assert_array_equal(keep, np.concatenate([k0, k1]))


def test_postprocess_score_threshold_and_rescale():
    rng = np.random.default_rng(4)
    boxes = random_boxes(rng, 16)[None]
    scores = rng.uniform(0, 1, (1, 16)).astype(np.float32)
    labels = rng.integers(0, 5, (1, 16))
    b, s, l, keep = postprocess_detections(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        score_threshold=0.5, iou_threshold=0.8, scale_factor=2.0,
    )
    keep = np.asarray(keep)
    assert np.all(np.asarray(s)[~keep] == -np.inf)
    assert np.all(scores[0][keep[0]] >= 0.5)
    np.testing.assert_allclose(np.asarray(b), boxes / 2.0)


def np_soft_nms(boxes, scores, iou_thr, sigma, min_score, method):
    """Oracle: mmcv.ops.soft_nms semantics (Bodla et al.), sequential
    rescoring; returns final scores aligned with input order (-inf =
    discarded)."""
    boxes = boxes.astype(np.float64).copy()
    cur = scores.astype(np.float64).copy()
    n = len(cur)
    final = np.full(n, -np.inf)
    alive = np.ones(n, bool)
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    while True:
        cand = np.where(alive, cur, -np.inf)
        i = int(np.argmax(cand))
        if not np.isfinite(cand[i]) or cand[i] < min_score:
            break
        final[i] = cand[i]
        alive[i] = False
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        union = area[i] + area - inter
        iou = np.where(union > 0, inter / union, 0.0)
        if method == "linear":
            decay = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        else:
            decay = np.exp(-(iou * iou) / sigma)
        cur = np.where(alive, cur * decay, cur)
    return final


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("method", ["linear", "gaussian"])
def test_soft_nms_matches_oracle(seed, method):
    from codetr_tpu.ops.nms import soft_nms

    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, 48)
    scores = rng.uniform(0, 1, 48).astype(np.float32)
    got = np.asarray(
        soft_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.8, 0.5, 1e-3, method)
    )
    want = np_soft_nms(boxes, scores, 0.8, 0.5, 1e-3, method)
    kept = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), kept)
    np.testing.assert_allclose(got[kept], want[kept], rtol=1e-5, atol=1e-6)


def test_soft_nms_duplicate_suppression():
    # two identical boxes: linear soft-NMS at iou_thr<1 zeroes the duplicate
    from codetr_tpu.ops.nms import soft_nms

    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    got = np.asarray(soft_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 0.5, 1e-3, "linear"))
    assert got[0] == pytest.approx(0.9)
    assert got[1] == -np.inf  # decayed by factor (1 - 1.0) = 0 -> below min_score
    assert got[2] == pytest.approx(0.7)


def test_postprocess_soft_nms_path():
    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 32)[None]
    scores = rng.uniform(0, 1, (1, 32)).astype(np.float32)
    labels = rng.integers(0, 3, (1, 32))
    b, s, l, keep = postprocess_detections(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        score_threshold=0.0, iou_threshold=0.8, scale_factor=None,
        nms_type="soft_nms",
    )
    s, keep = np.asarray(s), np.asarray(keep)
    assert np.all(np.isfinite(s[keep]))
    assert np.all(s[~keep] == -np.inf)
    # rescored values never exceed the originals
    assert np.all(s[keep] <= scores[keep] + 1e-6)
