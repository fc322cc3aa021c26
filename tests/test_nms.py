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
