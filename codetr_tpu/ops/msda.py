"""Multi-scale deformable attention — the single custom op of Co-DETR.

The reference implements this three ways: a CUDA kernel
(codetr/csrc/ms_deform_attn.cu:211-261 forward), a pure-PyTorch grid_sample
fallback (codetr/ops.py:129-186), and a TensorRT IPluginV3 plugin
(codetr/csrc/deformable_attention_plugin.cpp).  The TPU build collapses those
into two implementations with identical semantics:

- ``multi_scale_deformable_attention_reference``: pure jnp, XLA-gather based.
  Runs everywhere (CPU/TPU), fully jittable, serves as the numerical oracle —
  the analog of the reference's PyTorch fallback and FakeTensor abstract rule
  rolled into one (shapes are checked eagerly at trace time).
- ``multi_scale_deformable_attention`` in msda_pallas.py: the fused Pallas TPU
  kernel (per-level gather + bilinear + weighted accumulate) — the analog of
  the CUDA kernel + TRT plugin.  Because it is a jax primitive inside the
  jitted graph, it survives AOT serialization with no plugin registry.

Sampling semantics (must match torch.nn.functional.grid_sample with
``mode='bilinear', padding_mode='zeros', align_corners=False`` as invoked at
codetr/ops.py:171-173): a normalized location ``loc`` in [0, 1] maps to pixel
coordinate ``loc * size - 0.5``; each sample takes 4 bilinear taps; taps whose
integer corner falls outside the feature map contribute zero.

Shapes (batch-first, matching the reference op schema
codetr/csrc/deformable_attention_torch.cpp:16-24):
  value:              (bs, num_keys, num_heads, head_dims)
  spatial_shapes:     static tuple ((H0,W0), ..., (H{L-1},W{L-1}))
  sampling_locations: (bs, num_queries, num_heads, num_levels, num_points, 2)  xy in [0,1]
  attention_weights:  (bs, num_queries, num_heads, num_levels, num_points)
  returns:            (bs, num_queries, num_heads * head_dims)

TPU-first notes: ``spatial_shapes`` is a *static* python tuple, not a traced
tensor — XLA requires static shapes anyway and this removes the reference's
level_start_index bookkeeping tensor entirely (start indices are compile-time
constants).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Shapes = Tuple[Tuple[int, int], ...]


def _check_shapes(value, spatial_shapes: Shapes, sampling_locations, attention_weights):
    bs, num_keys, num_heads, head_dims = value.shape
    L = len(spatial_shapes)
    assert sampling_locations.ndim == 6 and sampling_locations.shape[-1] == 2, sampling_locations.shape
    assert attention_weights.ndim == 5, attention_weights.shape
    assert sampling_locations.shape[:2] == attention_weights.shape[:2]
    assert sampling_locations.shape[2] == num_heads and attention_weights.shape[2] == num_heads
    assert sampling_locations.shape[3] == L and attention_weights.shape[3] == L
    assert sampling_locations.shape[4] == attention_weights.shape[4]
    total = sum(h * w for h, w in spatial_shapes)
    assert total == num_keys, f"spatial_shapes sum {total} != num_keys {num_keys}"


def _sample_one_level_headmajor(value_l, loc_l, H: int, W: int):
    """Head-major variant: gathers per (bs*heads) slab so each gather touches
    only head_dims channels (matches the CUDA kernel's memory pattern,
    ms_deform_attn.cu:31-77).

    value_l: (bs*h, H*W, d); loc_l: (bs*h, Q, P, 2). Returns (bs*h, Q, P, d).
    """
    dtype = value_l.dtype
    # coordinate math in >= fp32 (bf16 coords would quantize pixel positions)
    coord_t = jnp.promote_types(loc_l.dtype, jnp.float32)
    x = loc_l[..., 0].astype(coord_t) * W - 0.5  # (bh,Q,P)
    y = loc_l[..., 1].astype(coord_t) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(dtype)
    ty = (y - y0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # (bh,Q,P)
            wx = tx if dx == 1 else (1.0 - tx)
            wy = ty if dy == 1 else (1.0 - ty)
            w = (wx * wy) * valid.astype(dtype)
            bh, Q, P = flat.shape
            tap = jnp.take_along_axis(value_l, flat.reshape(bh, Q * P, 1), axis=1)
            tap = tap.reshape(bh, Q, P, value_l.shape[-1])
            contrib = tap * w[..., None]
            out = contrib if out is None else out + contrib
    return out


@partial(jax.jit, static_argnames=("spatial_shapes",))
def multi_scale_deformable_attention_reference(
    value: jax.Array,
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Pure-jnp MSDA (oracle; mirrors semantics of codetr/ops.py:129-186)."""
    _check_shapes(value, spatial_shapes, sampling_locations, attention_weights)
    bs, num_keys, num_heads, head_dims = value.shape
    Q = sampling_locations.shape[1]
    P = sampling_locations.shape[4]

    # head-major layout: (bs*h, K, d) slabs; queries follow.
    value_hm = value.transpose(0, 2, 1, 3).reshape(bs * num_heads, num_keys, head_dims)
    loc_hm = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        bs * num_heads, Q, len(spatial_shapes), P, 2
    )

    start = 0
    acc = jnp.zeros((bs * num_heads, Q, head_dims), dtype=value.dtype)
    for lvl, (H, W) in enumerate(spatial_shapes):
        count = H * W
        v_l = jax.lax.slice_in_dim(value_hm, start, start + count, axis=1)
        samples = _sample_one_level_headmajor(v_l, loc_hm[:, :, lvl], H, W)  # (bh,Q,P,d)
        w_l = (
            attention_weights[:, :, :, lvl]
            .transpose(0, 2, 1, 3)
            .reshape(bs * num_heads, Q, P)
        )
        acc = acc + jnp.einsum("bqpd,bqp->bqd", samples, w_l.astype(samples.dtype))
        start += count

    out = acc.reshape(bs, num_heads, Q, head_dims).transpose(0, 2, 1, 3)
    return out.reshape(bs, Q, num_heads * head_dims)


def multi_scale_deformable_attention(
    value: jax.Array,
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    *,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching entry point (the analog of the reference's CUDA-vs-CPU
    dispatch at codetr/multi_scale_deformable_attention.py:203-210).

    impl: "auto" | "reference" | "pallas".  "auto" picks the Pallas kernel on
    TPU backends and the jnp reference elsewhere.
    """
    if impl == "reference":
        return multi_scale_deformable_attention_reference(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl in ("auto", "pallas"):
        if impl == "pallas" or jax.default_backend() == "tpu":
            from codetr_tpu.ops.msda_pallas import msda_pallas

            return msda_pallas(value, spatial_shapes, sampling_locations, attention_weights)
        return multi_scale_deformable_attention_reference(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    raise ValueError(f"unknown impl {impl!r}")
