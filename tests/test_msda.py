"""Unit tests for multi-scale deformable attention.

Mirrors the reference's test strategy
(tests/test_multi_scale_deformable_attention.py:246-364): the oracle is an
independent torch implementation built directly on
``torch.nn.functional.grid_sample`` (bilinear, zeros padding,
align_corners=False) — the same primitive the reference's PyTorch fallback
uses — compared against the jnp reference at double/float/half tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from codetr_tpu.ops.msda import multi_scale_deformable_attention_reference


def torch_msda_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Torch oracle: per-level grid_sample + weighted sum.

    value: (bs, K, h, d) ; locations (bs, Q, h, L, P, 2) in [0,1];
    weights (bs, Q, h, L, P). Returns (bs, Q, h*d).
    """
    bs, _, num_heads, d = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(bs * num_heads, d, H, W)
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).flatten(0, 1)  # (bs*h, Q, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(s)  # (bs*h, d, Q, P)
    w = attention_weights.permute(0, 2, 1, 3, 4).reshape(bs * num_heads, 1, Q, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w).sum(-1)
    return out.view(bs, num_heads * d, Q).transpose(1, 2).contiguous()


def make_inputs(
    rng, bs=2, num_heads=4, head_dims=8, Q=40, P=3,
    spatial_shapes=((6, 4), (3, 2), (2, 2)), dtype=np.float64,
    oob_fraction=0.2,
):
    K = sum(h * w for h, w in spatial_shapes)
    L = len(spatial_shapes)
    value = rng.standard_normal((bs, K, num_heads, head_dims)).astype(dtype)
    # locations mostly in [0,1], a fraction pushed out of bounds to exercise
    # the zero-padding branch
    loc = rng.uniform(0, 1, (bs, Q, num_heads, L, P, 2))
    oob = rng.uniform(-0.6, 1.6, loc.shape)
    pick = rng.uniform(0, 1, loc.shape) < oob_fraction
    loc = np.where(pick, oob, loc).astype(dtype)
    w = rng.uniform(0, 1, (bs, Q, num_heads, L, P)).astype(dtype)
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, spatial_shapes, loc, w


@pytest.mark.parametrize(
    "dtype,atol",
    [(np.float64, 1e-12), (np.float32, 1e-5)],
)
def test_msda_reference_matches_torch_grid_sample(dtype, atol):
    rng = np.random.default_rng(0)
    value, shapes, loc, w = make_inputs(rng, dtype=dtype)
    out_jax = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    )
    out_torch = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(w)
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(), atol=atol, rtol=0)


def test_msda_reference_realistic_5level_shapes():
    """5-level pyramid at 1/8 scale of the 608x608 config (fast on CPU)."""
    rng = np.random.default_rng(1)
    shapes = tuple((max(1, 76 // 2**i), max(1, 76 // 2**i)) for i in range(5))
    value, shapes, loc, w = make_inputs(
        rng, bs=1, num_heads=8, head_dims=4, Q=64, P=4,
        spatial_shapes=shapes, dtype=np.float32,
    )
    out_jax = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    )
    out_torch = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(w)
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(), atol=2e-5, rtol=0)


def test_msda_all_out_of_bounds_is_zero():
    rng = np.random.default_rng(2)
    value, shapes, loc, w = make_inputs(rng, dtype=np.float32)
    loc = np.full_like(loc, 5.0)  # everything far outside
    out = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)


def test_msda_grad_matches_torch():
    """Gradient parity wrt value/locations/weights (analog of the reference's
    gradcheck tests, tests/test_multi_scale_deformable_attention.py:367-414)."""
    rng = np.random.default_rng(3)
    value, shapes, loc, w = make_inputs(rng, bs=1, Q=10, dtype=np.float64)

    def loss_jax(v, l, a):
        out = multi_scale_deformable_attention_reference(v, shapes, l, a)
        return jnp.sum(out * out)

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(w).requires_grad_(True)
    out = torch_msda_oracle(tv, shapes, tl, ta)
    (out * out).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-10, rtol=0)
    # grid_sample gradients at exact cell boundaries are subgradients; the
    # random inputs avoid boundaries so tight tolerance is fine.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), atol=1e-10, rtol=0)


def test_pair_gather_matches_reference():
    """msda_pair_gather (decoder-tuned) vs the reference oracle, including
    out-of-bounds and boundary-column taps."""
    from codetr_tpu.ops.msda import msda_pair_gather

    rng = np.random.default_rng(7)
    value, shapes, loc, w = make_inputs(
        rng, bs=2, num_heads=4, head_dims=8, Q=37, P=4,
        spatial_shapes=((7, 5), (4, 3), (2, 2)), dtype=np.float32, oob_fraction=0.3,
    )
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = msda_pair_gather(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_quad_gather_matches_reference():
    """msda_quad_gather (one gathered row per tap, all 4 corners packed) vs
    the oracle, including out-of-bounds, boundary rows/cols, and a W=2
    level exercising the clamp shifts."""
    from codetr_tpu.ops.msda import msda_quad_gather

    rng = np.random.default_rng(8)
    value, shapes, loc, w = make_inputs(
        rng, bs=2, num_heads=4, head_dims=8, Q=37, P=4,
        spatial_shapes=((7, 5), (4, 3), (2, 2)), dtype=np.float32, oob_fraction=0.3,
    )
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = msda_quad_gather(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_quad_gather_exact_boundary_taps():
    """Taps exactly on corner/edge pixels (x0 = W-1, y0 = H-1, x0 = -1)."""
    from codetr_tpu.ops.msda import msda_quad_gather

    shapes = ((4, 4),)
    rng = np.random.default_rng(9)
    value = rng.standard_normal((1, 16, 2, 4)).astype(np.float32)
    # pixel coords: (3.0, 3.0) corner; (-0.4, 2.0) left edge; (3.6, 0.2) right oob-ish
    px = np.array([[3.0, -0.4, 3.6]])
    py = np.array([[3.0, 2.0, 0.2]])
    loc = np.zeros((1, 3, 2, 1, 1, 2), np.float32)
    loc[0, :, 0, 0, 0, 0] = (px + 0.5) / 4.0
    loc[0, :, 0, 0, 0, 1] = (py + 0.5) / 4.0
    loc[0, :, 1] = loc[0, :, 0]
    w = np.ones((1, 3, 2, 1, 1), np.float32)
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = msda_quad_gather(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_pitched_gather_matches_reference():
    """msda_pitched_gather_qm (single 4-corner-packed gather over a common-
    pitch table) vs the oracle, incl. out-of-bounds and boundary taps."""
    from codetr_tpu.ops.msda import msda_pitched_gather_qm

    rng = np.random.default_rng(10)
    value, shapes, loc, w = make_inputs(
        rng, bs=2, num_heads=4, head_dims=8, Q=37, P=4,
        spatial_shapes=((7, 5), (4, 3), (2, 2)), dtype=np.float32, oob_fraction=0.3,
    )
    ref = multi_scale_deformable_attention_reference(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    loc_t = jnp.asarray(loc).transpose(0, 2, 3, 4, 5, 1)
    got = msda_pitched_gather_qm(
        jnp.asarray(value), shapes, loc_t[..., 0, :], loc_t[..., 1, :],
        jnp.asarray(w).transpose(0, 2, 3, 4, 1),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_pitched_gather_chunked_matches():
    from codetr_tpu.ops.msda import msda_pitched_gather_qm

    rng = np.random.default_rng(11)
    value, shapes, loc, w = make_inputs(
        rng, bs=1, num_heads=2, head_dims=4, Q=53, P=2,
        spatial_shapes=((6, 6), (3, 3)), dtype=np.float32, oob_fraction=0.2,
    )
    loc_t = jnp.asarray(loc).transpose(0, 2, 3, 4, 5, 1)
    args = (jnp.asarray(value), shapes, loc_t[..., 0, :], loc_t[..., 1, :],
            jnp.asarray(w).transpose(0, 2, 3, 4, 1))
    a = msda_pitched_gather_qm(*args, q_chunk=16)
    b = msda_pitched_gather_qm(*args, q_chunk=8192)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("d", [8, 16, 32, 64])
def test_fused_pair_backward_matches_torch(d):
    """Fused pair-table custom VJP (msda_pair_gather_qm_ad) vs torch autograd
    across the channel counts the reference sweeps
    (tests/test_multi_scale_deformable_attention.py:367-414), with
    out-of-range locations and query chunking exercised."""
    from codetr_tpu.ops.msda import msda_pair_gather_qm_ad

    shapes = ((6, 7), (3, 4), (2, 2), (1, 1))
    L = len(shapes)
    bs, h, P, Q = 2, 3, 4, 11
    K = sum(hh * ww for hh, ww in shapes)
    rng = np.random.default_rng(4)
    value = rng.standard_normal((bs, K, h, d))
    loc = rng.uniform(-0.15, 1.15, (bs, Q, h, L, P, 2))
    w = rng.uniform(0, 1, (bs, Q, h, L, P))
    g = rng.standard_normal((bs, Q, h * d))

    def loss_jax(v, x, y, a):
        out = msda_pair_gather_qm_ad(v, shapes, x, y, a, 4)
        return jnp.vdot(out, jnp.asarray(g))

    x_qm = jnp.asarray(loc[..., 0].transpose(0, 2, 3, 4, 1))
    y_qm = jnp.asarray(loc[..., 1].transpose(0, 2, 3, 4, 1))
    w_qm = jnp.asarray(w.transpose(0, 2, 3, 4, 1))
    gv, gx, gy, ga = jax.grad(loss_jax, argnums=(0, 1, 2, 3))(
        jnp.asarray(value), x_qm, y_qm, w_qm
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(w).requires_grad_(True)
    out = torch_msda_oracle(tv, shapes, tl, ta)
    (out * torch.from_numpy(g)).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-8, rtol=1e-8)
    gl_t = tl.grad.numpy()
    np.testing.assert_allclose(
        np.asarray(gx), gl_t[..., 0].transpose(0, 2, 3, 4, 1), atol=1e-7, rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gy), gl_t[..., 1].transpose(0, 2, 3, 4, 1), atol=1e-7, rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ga), ta.grad.numpy().transpose(0, 2, 3, 4, 1), atol=1e-8, rtol=1e-8
    )
