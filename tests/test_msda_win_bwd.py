"""Fused windowed MSDA backward (ops/msda_win_bwd.py) vs oracle AD.

In-envelope coordinates make the windowed part the ENTIRE op, so the fused
backward must reproduce the oracle's VJP exactly (up to fp32 reassociation).
The reference analog validates col2im against autograd gradcheck
(tests/test_multi_scale_deformable_attention.py:367-414)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.ops.msda import msda_reference_qm
from codetr_tpu.ops.msda_win import pack_coords_qmajor, unpack_coords_qmajor
from codetr_tpu.ops.msda_win_bwd import msda_win_qm_packed_bwd

SHAPES = ((32, 32), (16, 16), (8, 8), (4, 4), (2, 2))
K = sum(a * b for a, b in SHAPES)


def _grid_coords(h, P, jit_px, seed=0):
    from codetr_tpu.ops.msda_grid import _anchor

    rng = np.random.default_rng(seed)
    L = len(SHAPES)
    x = np.zeros((1, h, L, P, K), np.float32)
    y = np.zeros_like(x)
    q0 = 0
    for lq, (Hq, Wq) in enumerate(SHAPES):
        iy, ix = np.meshgrid(np.arange(Hq), np.arange(Wq), indexing="ij")
        for lt, (Ht, Wt) in enumerate(SHAPES):
            ay = _anchor(iy, Hq, Ht).reshape(-1)
            ax = _anchor(ix, Wq, Wt).reshape(-1)
            y[0, :, lt, :, q0:q0 + Hq * Wq] = (
                ay + rng.uniform(-jit_px, jit_px, (h, P, Hq * Wq)) + 0.5
            ) / Ht
            x[0, :, lt, :, q0:q0 + Hq * Wq] = (
                ax + rng.uniform(-jit_px, jit_px, (h, P, Hq * Wq)) + 0.5
            ) / Wt
        q0 += Hq * Wq
    w = rng.uniform(0, 1, (1, h, L, P, K)).astype(np.float32)
    w /= w.sum(axis=(2, 3), keepdims=True)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)


@pytest.mark.parametrize("firing", [False, True])
def test_production_packed_vjp_matches_oracle(firing):
    """End-to-end VJP of the PRODUCTION dispatch (_win_exact_ad_packed:
    fused windowed backward + coarse pair VJP + cond-gated correction VJP)
    vs the oracle's AD — including the case where out-of-envelope taps fire
    the sparse correction tier."""
    from codetr_tpu.ops.msda import msda_grid_packed
    from codetr_tpu.ops.msda_calibrate import (
        fire_rate_table,
        synthetic_trained_offsets,
    )

    h, P, d = 4, 2, 16
    L = len(SHAPES)
    rng = np.random.default_rng(1)
    if firing:
        # levels must be big enough that query-tile windows do not cover
        # them whole (an edge-clamped window is exact for any offset)
        shapes = ((64, 64), (32, 32), (16, 16), (8, 8), (4, 4))
        x, y, w = synthetic_trained_offsets(
            shapes, num_heads=h, num_points=P, scale=2.0, seed=2
        )
        assert fire_rate_table(shapes, x, y, w, radii=(5,))[5] > 0
    else:
        shapes = SHAPES
        x, y, w = _grid_coords(h, P, jit_px=2.0, seed=2)
    k = sum(a * b for a, b in shapes)
    value = jnp.asarray(rng.standard_normal((1, k, h, d)), jnp.float32)
    cpk = pack_coords_qmajor(x, y, w, interpret=True)
    g = jnp.asarray(rng.standard_normal((1, k, h * d)), jnp.float32)

    def prod(v, c):
        return msda_grid_packed(v, shapes, c, P, impl="auto", radius=5,
                                correction_budget=4096)

    def oracle(v, c):
        xx, yy, ww = unpack_coords_qmajor(c, h, L, P)
        return msda_reference_qm(v, shapes, xx, yy, ww)

    out_p, vjp_p = jax.vjp(prod, value, cpk)
    out_o, vjp_o = jax.vjp(oracle, value, cpk)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_o), atol=2e-5, rtol=1e-5
    )
    gv_p, gc_p = vjp_p(g)
    gv_o, gc_o = vjp_o(g)
    sv = np.abs(np.asarray(gv_o)).max() + 1e-9
    sc = np.abs(np.asarray(gc_o)).max() + 1e-9
    assert np.abs(np.asarray(gv_p) - np.asarray(gv_o)).max() / sv < 1e-5
    assert np.abs(np.asarray(gc_p) - np.asarray(gc_o)).max() / sc < 1e-5


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_windowed_backward_matches_oracle_vjp(seed):
    h, P, d = 8, 4, 32
    L = len(SHAPES)
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((1, K, h, d)), jnp.float32)
    # jitter < radius-1 keeps every tap in-envelope: the windowed part IS
    # the whole op, so its fused VJP must equal the oracle's
    x, y, w = _grid_coords(h, P, jit_px=2.0, seed=seed)
    cpk = pack_coords_qmajor(x, y, w, interpret=True)
    g = jnp.asarray(rng.standard_normal((1, K, h * d)), jnp.float32)

    def oracle(v, c):
        xx, yy, ww = unpack_coords_qmajor(c, h, L, P)
        return msda_reference_qm(v, SHAPES, xx, yy, ww)

    out, vjp = jax.vjp(oracle, value, cpk)
    want_gv, want_gc = vjp(g)

    got_gv, got_gc = msda_win_qm_packed_bwd(
        value, SHAPES, cpk, g, P, radius=5, interpret=True
    )

    # coarse (oracle-routed) query levels carry zero grad in the fused
    # kernel by design — mask them out of the comparison
    from codetr_tpu.ops.msda_win import _tile_shape_for_level

    q0 = 0
    keep = np.zeros(K, bool)
    for lq, (Hq, Wq) in enumerate(SHAPES):
        th, tw = _tile_shape_for_level(lq, L)
        if th * tw >= 16:
            keep[q0:q0 + Hq * Wq] = True
        q0 += Hq * Wq

    gc_got = np.asarray(got_gc)[0]
    gc_want = np.asarray(want_gc)[0]
    err_c = np.abs(gc_got[keep] - gc_want[keep]).max()
    scale_c = np.abs(gc_want[keep]).max() + 1e-9
    assert err_c / scale_c < 1e-5, (err_c, scale_c)

    # grad_value: the coarse levels' QUERIES contribute to grad_value in the
    # oracle but not in the fused kernel — recompute the oracle VJP with the
    # coarse queries' grads zeroed for an apples-to-apples value comparison
    g_masked = np.asarray(g).copy()
    g_masked[0, ~keep, :] = 0.0
    _, vjp2 = jax.vjp(oracle, value, cpk)
    want_gv2, _ = vjp2(jnp.asarray(g_masked))
    gv_got = np.asarray(got_gv)
    gv_want = np.asarray(want_gv2)
    err_v = np.abs(gv_got - gv_want).max()
    scale_v = np.abs(gv_want).max() + 1e-9
    assert err_v / scale_v < 1e-5, (err_v, scale_v)
