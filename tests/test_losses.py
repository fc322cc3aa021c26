"""Hungarian matching + QFL/L1/GIoU losses (reference training recipe:
configs/co_dino_5scale_r50_lsj_8xb2_1x_coco.py:107-113,197-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.parallel.losses import (
    cxcywh_to_xyxy,
    dino_detection_loss,
    giou,
    giou_matrix,
    hungarian_match,
    iou_aligned,
    quality_focal_loss,
)


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[2.0, 2.0, 3.0, 3.0]])
    assert float(giou(a, a)[0]) == pytest.approx(1.0)
    # disjoint unit boxes in a 3x3 enclosure: iou 0, penalty (9-2)/9
    assert float(giou(a, b)[0]) == pytest.approx(-7.0 / 9.0, abs=1e-6)
    assert float(iou_aligned(a, b)[0]) == 0.0
    m = giou_matrix(jnp.concatenate([a, b]), jnp.concatenate([a, b]))
    np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-6)


def test_hungarian_match_prefers_overlapping_query():
    """Two gts, four queries: the queries sitting exactly on the gts (with
    confident logits) must win the assignment."""
    nq, ncls, max_gt = 4, 5, 3
    pred = jnp.asarray(
        [
            [0.25, 0.25, 0.2, 0.2],  # matches gt0
            [0.75, 0.75, 0.2, 0.2],  # matches gt1
            [0.5, 0.1, 0.05, 0.05],
            [0.9, 0.4, 0.1, 0.1],
        ],
        jnp.float32,
    )
    logits = jnp.full((nq, ncls), -4.0)
    logits = logits.at[0, 1].set(3.0).at[1, 2].set(3.0)
    gt_boxes = jnp.asarray(
        [[0.25, 0.25, 0.2, 0.2], [0.75, 0.75, 0.2, 0.2], [0, 0, 0, 0]], jnp.float32
    )
    gt_labels = jnp.asarray([1, 2, 0], jnp.int32)
    gt_valid = jnp.asarray([True, True, False])
    matched, valid = hungarian_match(logits, pred, gt_boxes, gt_labels, gt_valid)
    assert int(matched[0]) == 0
    assert int(matched[1]) == 1
    assert bool(valid[2]) is False


def test_qfl_zero_when_perfect():
    """Confident correct prediction with quality 1 and all other logits at
    -inf-ish: loss approaches 0."""
    nq, ncls = 3, 4
    logits = jnp.full((nq, ncls), -30.0)
    logits = logits.at[1, 2].set(30.0)
    matched = jnp.asarray([1], jnp.int32)
    labels = jnp.asarray([2], jnp.int32)
    quality = jnp.asarray([1.0], jnp.float32)
    valid = jnp.asarray([True])
    loss = quality_focal_loss(logits, matched, labels, quality, valid)
    assert float(loss) < 1e-6


def test_dino_loss_decreases_for_better_predictions():
    rng = np.random.default_rng(0)
    nl, bs, nq, ncls, max_gt = 2, 1, 16, 5, 4
    gt_boxes = jnp.asarray(rng.uniform(0.3, 0.6, (bs, max_gt, 4)), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(0, ncls, (bs, max_gt)), jnp.int32)
    gt_valid = jnp.ones((bs, max_gt), bool)

    def outputs(good):
        if good:
            coords = jnp.tile(gt_boxes[None], (nl, 1, 1, 1))
            coords = jnp.concatenate(
                [coords, jnp.full((nl, bs, nq - max_gt, 4), 0.9)], axis=2
            )
            logits = jnp.full((nl, bs, nq, ncls), -8.0)
            for g in range(max_gt):
                logits = logits.at[:, 0, g, gt_labels[0, g]].set(8.0)
        else:
            coords = jnp.asarray(rng.uniform(0, 0.2, (nl, bs, nq, 4)), jnp.float32)
            logits = jnp.asarray(rng.normal(0, 1, (nl, bs, nq, ncls)), jnp.float32)
        return {
            "all_cls_logits": logits,
            "all_coords": coords,
            "enc_cls_logits": logits[0],
            "enc_coords": coords[0],
        }

    good, _ = dino_detection_loss(outputs(True), gt_boxes, gt_labels, gt_valid)
    bad, _ = dino_detection_loss(outputs(False), gt_boxes, gt_labels, gt_valid)
    assert float(good) < float(bad)
    assert np.isfinite(float(good)) and np.isfinite(float(bad))


def test_dino_loss_gradients_flow():
    nl, bs, nq, ncls, max_gt = 1, 1, 8, 3, 2
    rng = np.random.default_rng(1)
    gt_boxes = jnp.asarray(rng.uniform(0.2, 0.7, (bs, max_gt, 4)), jnp.float32)
    gt_labels = jnp.zeros((bs, max_gt), jnp.int32)
    gt_valid = jnp.ones((bs, max_gt), bool)
    logits = jnp.asarray(rng.normal(0, 1, (nl, bs, nq, ncls)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0.1, 0.9, (nl, bs, nq, 4)), jnp.float32)

    def f(lg, co):
        out = {
            "all_cls_logits": lg,
            "all_coords": co,
            "enc_cls_logits": lg[0],
            "enc_coords": co[0],
        }
        t, _ = dino_detection_loss(out, gt_boxes, gt_labels, gt_valid)
        return t

    gl, gc = jax.grad(f, argnums=(0, 1))(logits, coords)
    assert np.isfinite(np.asarray(gl)).all() and np.isfinite(np.asarray(gc)).all()
    assert float(jnp.abs(gl).sum()) > 0 and float(jnp.abs(gc).sum()) > 0
