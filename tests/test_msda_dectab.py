"""Decoder raw-table MSDA (ops/msda_dectab.py) vs the per-layer projected
path: the shared corner table + post-interpolation value_proj must reproduce
the module's gather path exactly (linearity of bilinear sampling), including
bias handling at masked keys and out-of-image corners with an arbitrary
(non-rectangular) key_padding_mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.config import MSDAConfig
from codetr_tpu.models.msda_module import MultiScaleDeformableAttention
from codetr_tpu.ops.msda_dectab import build_raw_quad_table, msda_from_raw_table

SHAPES = ((8, 8), (4, 4), (2, 2))
K = sum(h * w for h, w in SHAPES)


def _make_table(memory, mask):
    unmask = 1.0 - mask.astype(memory.dtype)
    mem_aug = jnp.concatenate(
        [memory * unmask[..., None], unmask[..., None]], axis=-1
    )
    return build_raw_quad_table(mem_aug, SHAPES)


@pytest.mark.parametrize("with_mask", [False, True])
def test_module_table_path_matches_gather_path(with_mask):
    cfg = MSDAConfig(embed_dims=32, num_heads=4, num_levels=len(SHAPES), num_points=2)
    mod = MultiScaleDeformableAttention(cfg=cfg, dtype=jnp.float32, impl="auto")
    rng = np.random.default_rng(0)
    bs, Q = 2, 11
    query = jnp.asarray(rng.standard_normal((bs, Q, 32)), jnp.float32)
    memory = jnp.asarray(rng.standard_normal((bs, K, 32)), jnp.float32)
    # non-rectangular mask exercises the indicator-channel bias semantics
    mask = (
        jnp.asarray(rng.uniform(size=(bs, K)) < 0.3) if with_mask
        else jnp.zeros((bs, K), bool)
    )
    # 4-dim references (decoder box form), some near edges so corners drop
    ref = jnp.asarray(rng.uniform(0.0, 1.0, (bs, Q, len(SHAPES), 4)), jnp.float32)
    table = _make_table(memory, mask)

    params = mod.init(
        jax.random.PRNGKey(0), query, memory, None, None, mask, ref, SHAPES,
        table,
    )
    # make the projections nonzero (they init to zero kernels)
    params = jax.tree.map(
        lambda a: a + 0.05 * np.float32(1.0) if a.ndim >= 2 else a, params
    )

    out_gather = mod.apply(params, query, memory, None, None, mask, ref, SHAPES)
    out_table = mod.apply(
        params, query, memory, None, None, mask, ref, SHAPES, table
    )
    np.testing.assert_allclose(
        np.asarray(out_table), np.asarray(out_gather), rtol=1e-5, atol=1e-5
    )


def test_from_raw_table_matches_reference_interp():
    """msda_from_raw_table == direct bilinear interpolation of the raw
    memory (grid_sample zeros semantics), per head."""
    from codetr_tpu.ops.msda import msda_reference_qm

    rng = np.random.default_rng(1)
    bs, Q, h, P = 1, 7, 3, 2
    L = len(SHAPES)
    Cm = 8
    mem = jnp.asarray(rng.standard_normal((bs, K, Cm)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.05, 1.05, (bs, Q, h, L, P, 2)), jnp.float32)
    attw = jnp.asarray(rng.uniform(0, 1, (bs, Q, h, L, P)), jnp.float32)

    mem_aug = jnp.concatenate([mem, jnp.ones((bs, K, 1))], axis=-1)
    table = build_raw_quad_table(mem_aug, SHAPES)
    got = msda_from_raw_table(table, SHAPES, loc, attw)  # (bs, Q, h, Cm+1)

    # oracle: treat the raw channels as "heads x dims" of msda_reference_qm
    # with a single head by moving h into the query axis
    # (bs,Q,h,L,P) -> (bs,L,P,h,Q) so h folds adjacently into the query axis
    x = loc[..., 0].transpose(0, 3, 4, 2, 1).reshape(bs, 1, L, P, h * Q)
    y = loc[..., 1].transpose(0, 3, 4, 2, 1).reshape(bs, 1, L, P, h * Q)
    w = attw.transpose(0, 3, 4, 2, 1).reshape(bs, 1, L, P, h * Q)
    vals = msda_reference_qm(
        mem_aug.reshape(bs, K, 1, Cm + 1), SHAPES, x, y, w
    )  # (bs, h*Q, Cm+1)
    want = vals.reshape(bs, h, Q, Cm + 1).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
