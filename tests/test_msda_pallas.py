"""Pallas shift-window kernel vs the jnp implementations (interpret mode on
CPU; the compiled path is exercised on the real chip by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

# opt-in research path (ROUND2_NOTES: lost the perf race); all heavy
pytestmark = pytest.mark.slow

from codetr_tpu.ops.msda import multi_scale_deformable_attention_reference
from codetr_tpu.ops.msda_pallas import msda_grid_pallas
from tests.test_msda_grid import grid_inputs


@pytest.mark.parametrize("shapes,tile", [
    (((16, 16), (8, 8)), (8, 128)),
    (((8, 16), (4, 8), (2, 4)), (8, 128)),
])
def test_pallas_matches_reference_in_envelope(shapes, tile):
    rng = np.random.default_rng(0)
    value, loc, w = grid_inputs(rng, shapes, num_heads=2, head_dims=8, P=2,
                                radius=2, jitter=1.5)
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = msda_grid_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        radius=2, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_pallas_nonsquare_and_padding_tiles():
    """Query grids that don't divide the tile exercise the padded-tile path."""
    shapes = ((12, 20), (6, 10))
    rng = np.random.default_rng(1)
    value, loc, w = grid_inputs(rng, shapes, num_heads=2, head_dims=8, P=2,
                                radius=2, jitter=1.5)
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = msda_grid_pallas(jnp.asarray(value), shapes, jnp.asarray(loc),
                           jnp.asarray(w), radius=2, tile=(8, 128), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_pallas_coarse_pair_xla_fallback():
    """Pairs whose window exceeds max_window route through the exact XLA
    im2col path; result must still match the oracle."""
    shapes = ((32, 32), (16, 16), (8, 8), (4, 4))  # pair (3,0) margin 16
    rng = np.random.default_rng(2)
    value, loc, w = grid_inputs(rng, shapes, num_heads=2, head_dims=8, P=2,
                                radius=2, jitter=1.5)
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = msda_grid_pallas(jnp.asarray(value), shapes, jnp.asarray(loc),
                           jnp.asarray(w), radius=2, tile=(8, 128),
                           max_window=15, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_pallas_qm_gradients_match_oracle():
    """custom_vjp: Pallas forward, flat-gather-oracle backward (the analog of
    the reference's col2im backward kernels, ms_deform_attn.cu:433-897).
    Grad-parity vs differentiating the oracle directly, in-envelope."""
    import functools

    import jax

    from codetr_tpu.ops import msda_pallas
    from codetr_tpu.ops.msda import msda_reference_qm

    shapes = ((8, 8), (4, 4))
    rng = np.random.default_rng(11)
    value, loc, w = grid_inputs(rng, shapes, radius=3, jitter=2.0)
    loc_t = jnp.asarray(loc).transpose(0, 2, 3, 4, 5, 1)
    x, y = loc_t[..., 0, :], loc_t[..., 1, :]
    wq = jnp.asarray(w).transpose(0, 2, 3, 4, 1)
    val = jnp.asarray(value)

    pall = functools.partial(
        msda_pallas.msda_grid_pallas_qm, spatial_shapes=shapes, radius=3,
        interpret=True,
    )

    def loss_p(v, xx, yy, ww):
        return jnp.sum(jnp.sin(pall(v, x=xx, y=yy, w=ww)))

    def loss_r(v, xx, yy, ww):
        return jnp.sum(jnp.sin(msda_reference_qm(v, shapes, xx, yy, ww)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(val, x, y, wq)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(val, x, y, wq)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)
