"""MultiScaleDeformableAttention flax module.

Re-implements the reference module
(codetr/multi_scale_deformable_attention.py:15-218) batch-first: query/value
projections, per-query sampling-offset and attention-weight heads, reference-
point math for 2-point and 4-point references, then the fused sampling op
(codetr_tpu.ops.msda — Pallas on TPU, jnp gather elsewhere).

The reference's grid-pattern bias init for sampling_offsets
(multi_scale_deformable_attention.py:97-115) is reproduced because it defines
the op's behavior under randomly-initialized tests (the reference's own test
strategy builds models without weights, tests/test_export.py:228).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from codetr_tpu.config import MSDAConfig
from codetr_tpu.ops.msda import (
    msda_grid_qm,
    msda_reference_qm,
    multi_scale_deformable_attention,
)


def _grid_offset_bias(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """Reference init: unit directions at head angles, scaled by point index
    (multi_scale_deformable_attention.py:101-111)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (h, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MultiScaleDeformableAttention(nn.Module):
    cfg: MSDAConfig
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # kernel dispatch: auto | reference | grid
    # queries are the level-concatenated pixel grid (encoder self-attention):
    # enables the gather-free shift-window path (ops/msda_grid.py)
    grid_queries: bool = False
    # 5, not 4: the reference offset init reaches exactly +-4 px (point
    # index 3 x unit direction), and radius 5 is the smallest envelope that
    # keeps ALL init taps in-window (measured: radius 4 leaves 39k/4.9M
    # taps out at 608x608 -> the exact-but-expensive correction pass would
    # fire on every call at init weights; radius 5 leaves 0 out)
    grid_radius: int = 5

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (bs, nq, C)
        value: Optional[jax.Array] = None,  # (bs, nk, C)
        identity: Optional[jax.Array] = None,
        query_pos: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,  # (bs, nk) True = pad
        reference_points: Optional[jax.Array] = None,  # (bs, nq, L, 2|4)
        spatial_shapes: Tuple[Tuple[int, int], ...] = (),
    ) -> jax.Array:
        c = self.cfg
        if value is None:
            value = query
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        bs, num_query, _ = query.shape
        num_value = value.shape[1]
        assert sum(h * w for h, w in spatial_shapes) == num_value

        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        value_proj_size = int(c.embed_dims * c.value_proj_ratio)
        v = dense(value_proj_size, "value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(bs, num_value, c.num_heads, value_proj_size // c.num_heads)

        raw_offsets = nn.Dense(
            c.num_heads * c.num_levels * c.num_points * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _grid_offset_bias(c.num_heads, c.num_levels, c.num_points), dtype
            ),
            name="sampling_offsets",
        )(query)  # (bs, nq, h*L*P*2)

        raw_attn = nn.Dense(
            c.num_heads * c.num_levels * c.num_points,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query)  # (bs, nq, h*L*P)

        if self.grid_queries:
            # Q-MINOR coordinate pipeline (encoder self-attention): the query
            # axis stays MINOR through every coordinate tensor.  The standard
            # (bs,Q,h,L,P,2) layout tile-pads its tiny trailing dims (P,2) ->
            # (8,128) with up to 128x memory waste — measured ~140 ms/forward
            # of pure layout traffic at 608x608 in round 1.  One clean
            # (bs,K,F)->(bs,F,K) transpose here instead, then reshapes only
            # split the MAJOR axis (free).  Coordinates are fp32: bf16 [0,1]
            # locations quantize to ~0.6 px at stride-4 resolution.
            h_, L_, P_ = c.num_heads, c.num_levels, c.num_points
            K = num_query
            f32 = jnp.float32
            off_qm = (
                raw_offsets.astype(f32).transpose(0, 2, 1).reshape(bs, h_, L_, P_, 2, K)
            )
            attn_qm = raw_attn.astype(f32).transpose(0, 2, 1).reshape(bs, h_, L_ * P_, K)
            attn_qm = jax.nn.softmax(attn_qm, axis=2).reshape(bs, h_, L_, P_, K)

            # reference points in q-minor layout (bs, L, 2, K)
            assert reference_points.shape == (bs, L_, 2, K), reference_points.shape
            norm_x = jnp.asarray([ww for _, ww in spatial_shapes], f32)
            norm_y = jnp.asarray([hh for hh, _ in spatial_shapes], f32)
            bcast = (None, None, slice(None), None, None)
            x = (
                reference_points[:, None, :, 0, None, :]
                + off_qm[..., 0, :] / norm_x[bcast]
            )
            y = (
                reference_points[:, None, :, 1, None, :]
                + off_qm[..., 1, :] / norm_y[bcast]
            )

            if self.impl == "reference":
                out = msda_reference_qm(v, spatial_shapes, x, y, attn_qm)
            else:
                out = msda_grid_qm(
                    v, spatial_shapes, x, y, attn_qm,
                    impl=self.impl, radius=self.grid_radius,
                )
            out = out.astype(self.dtype)
            out = dense(c.embed_dims, "output_proj")(out)
            return out + identity

        offsets = raw_offsets.reshape(
            bs, num_query, c.num_heads, c.num_levels, c.num_points, 2
        )
        attn = raw_attn.reshape(bs, num_query, c.num_heads, c.num_levels * c.num_points)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = attn.reshape(bs, num_query, c.num_heads, c.num_levels, c.num_points)

        if reference_points.shape[-1] == 2:
            # normalize offsets by (W, H) of each level
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
            )  # (L, 2) xy
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / c.num_points * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError(f"reference_points last dim must be 2 or 4, got {reference_points.shape[-1]}")

        out = multi_scale_deformable_attention(
            v, spatial_shapes, loc, attn, impl=self.impl, grid_queries=False,
        )
        out = dense(c.embed_dims, "output_proj")(out)
        return out + identity
