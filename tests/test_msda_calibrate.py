"""Correction-path calibration (ops/msda_calibrate.py) + budget plumbing.

Covers the round-3 VERDICT item-3 machinery: fire-rate measurement matches
the production envelope mask, suggest_correction returns sane plans, and
the tiered correction stays EXACT through both the sparse tier and the
(pitched-gather) full tier when out-of-envelope taps exist."""

import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.ops.msda import msda_grid_packed, msda_reference_qm
from codetr_tpu.ops.msda_calibrate import (
    fire_rate_table,
    suggest_correction,
    synthetic_trained_offsets,
)
from codetr_tpu.ops.msda_win import pack_coords_qmajor

SHAPES = ((16, 16), (8, 8), (4, 4), (2, 2), (1, 1))
K = sum(h * w for h, w in SHAPES)
# big enough that query-tile windows do NOT cover whole levels (a window
# clamped to the level edge is exact for any tap beyond it, so tiny levels
# never fire the correction)
BIG_SHAPES = ((64, 64), (32, 32), (16, 16), (8, 8), (4, 4))
BIG_K = sum(h * w for h, w in BIG_SHAPES)


def _coords(scale, seed=0):
    return synthetic_trained_offsets(
        SHAPES, num_heads=4, num_points=2, scale=scale, seed=seed
    )


def test_fire_rate_monotone_in_radius_and_scale():
    x1, y1, w1 = _coords(1.0)
    t1 = fire_rate_table(SHAPES, x1, y1, w1, radii=(3, 5, 8))
    assert t1[3] >= t1[5] >= t1[8]
    x4, y4, w4 = _coords(4.0)
    t4 = fire_rate_table(SHAPES, x4, y4, w4, radii=(3, 5, 8))
    assert t4[5] >= t1[5]
    # a huge radius covers whole levels -> nothing fires
    t_big = fire_rate_table(SHAPES, x1, y1, w1, radii=(32,))
    assert t_big[32] == 0


def test_suggest_correction_plan_sane():
    x, y, w = _coords(1.0)
    plan = suggest_correction(SHAPES, x, y, w, radii=(3, 5, 8))
    assert plan.radius in (3, 5, 8)
    assert plan.budget >= plan.fire_rate[plan.radius]
    assert set(plan.est_ms) == {3, 5, 8}


@pytest.mark.parametrize("budget", [4096, 2])
def test_correction_tiers_exact(budget):
    """Offsets at 2x init scale push taps out of the radius-5 envelope; with
    a roomy budget the SPARSE tier restores them, with budget=2 the FULL
    (pitched-gather) tier does.  Both must reproduce the oracle exactly."""
    rng = np.random.default_rng(0)
    h, P = 4, 2
    x, y, w = synthetic_trained_offsets(
        BIG_SHAPES, num_heads=h, num_points=P, scale=2.0, seed=1
    )
    t = fire_rate_table(BIG_SHAPES, x, y, w, radii=(5,))
    assert t[5] > 0, "test needs out-of-envelope taps"
    value = jnp.asarray(rng.standard_normal((1, BIG_K, h, 8)), jnp.float32)
    cpk = pack_coords_qmajor(x, y, w, interpret=True)
    got = msda_grid_packed(
        value, BIG_SHAPES, cpk, P, impl="auto", radius=5,
        correction_budget=budget,
    )
    want = msda_reference_qm(value, BIG_SHAPES, x, y, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_calibrate_model_end_to_end():
    """Checkpoint-day calibration path: build the tiny model, capture the
    REAL encoder sampling coordinates via the sow hook, and get a plan."""
    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.ops.msda_calibrate import calibrate_model

    cfg = tiny_test_config()
    model, params = build_codetr(cfg, msda_impl="reference", input_shape=(64, 64))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
                    jnp.float32) * 0.1
    m = jnp.zeros((1, 64, 64), jnp.float32)
    plan = calibrate_model(model, params, x, m, radii=(3, 5))
    assert plan.radius in (3, 5)
    assert plan.budget >= 4096
    assert set(plan.fire_rate) == {3, 5}
    # init-like offsets: radius 5 must fire (almost) nothing more than r3
    assert plan.fire_rate[5] <= plan.fire_rate[3]
