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
    msda_grid_packed,
    msda_grid_qm,
    msda_reference_qm,
    multi_scale_deformable_attention,
)


def _grid_offset_bias(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """Reference init: unit directions at head angles, scaled by point index
    (multi_scale_deformable_attention.py:101-111).

    LAYOUT: this framework's sampling_offsets projection emits the x- and
    y-offsets DEINTERLEAVED — [all-x (h*L*P) | all-y (h*L*P)] — instead of
    the reference's interleaved (..., 2) minor axis.  The coordinate pipeline
    then runs entirely on flat (bs, K, h*L*P) lane-axis tensors: a tensor
    whose minor dims are (P, 2) tile-pads to (8, 128) on TPU — a 32x memory
    inflation that made the packed-coordinate build the top non-kernel cost
    (13.9 ms/call isolated at 1920x1280, tools/encattr.py, round 4).  The
    checkpoint converter permutes torch's interleaved columns on load
    (utils/checkpoint.py:_convert_msda)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (h, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    # (h, L, P, 2) -> (2, h, L, P): x-block then y-block
    return np.moveaxis(grid, -1, 0).reshape(-1).astype(np.float32)


class MultiScaleDeformableAttention(nn.Module):
    cfg: MSDAConfig
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # kernel dispatch: auto | reference | grid
    # queries are the level-concatenated pixel grid (encoder self-attention):
    # enables the gather-free shift-window path (ops/msda_grid.py)
    grid_queries: bool = False
    # None -> cfg.grid_radius (default 5, not 4: the reference offset init
    # reaches exactly +-4 px — point index 3 x unit direction — and radius 5
    # is the smallest envelope that keeps ALL init taps in-window; measured:
    # radius 4 leaves 39k/4.9M taps out at 608x608, so the correction would
    # fire on every call at init weights).  For trained checkpoints size
    # cfg.grid_radius/cfg.correction_budget via ops/msda_calibrate.
    grid_radius: Optional[int] = None

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
        raw_table: Optional[jax.Array] = None,  # (bs*R, 4*Cm) shared corner table
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
        # decoder raw-table path (ops/msda_dectab.py): the shared corner
        # table replaces the per-layer value projection + gather — the
        # projection is applied AFTER interpolation (linearity), so v is
        # only materialized on the non-table paths.
        use_table = (
            raw_table is not None and not self.grid_queries
            and self.impl == "auto"
        )
        if not use_table:
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

        if self.grid_queries and self.impl in ("auto", "win", "reference"):
            # Q-MAJOR PACKED coordinate pipeline (encoder self-attention,
            # round-3 production path): offsets/weights stay in the
            # projections' natural (bs, K, features) layout, the ref-point
            # math runs elementwise on the minor axis, and x/y/w are packed
            # on the channel axis into ONE (bs, K, C) tensor that the
            # windowed kernel consumes directly (per-tile raster BlockSpec +
            # in-VMEM transpose, ops/msda_win.py:msda_win_lq_packed).  The
            # former q-minor pipeline's (bs,K,F)->(bs,F,K) transposes plus
            # the kernel wrapper's tile interleave cost ~11 ms per encoder
            # call at 1920x1280 (ROUND3_NOTES.md) — all gone here.
            # Coordinates are fp32: bf16 [0,1] locations quantize to ~0.6 px
            # at stride-4 resolution.
            h_, L_, P_ = c.num_heads, c.num_levels, c.num_points
            K = num_query
            f32 = jnp.float32
            HLP = h_ * L_ * P_
            # FLAT coordinate math (round 4): every tensor keeps the large
            # h*L*P axis minor, so nothing tile-pads.  The projection emits
            # [x-block | y-block] (see _grid_offset_bias), so x/y are plain
            # lane slices; the per-lane inverse level norms are compile-time
            # constants with the same (h, L, P) flat pattern.
            off = raw_offsets.astype(f32)  # (bs, K, 2*HLP)
            inv_w = np.tile(
                np.repeat([1.0 / ww for _, ww in spatial_shapes], P_), h_
            )
            inv_h = np.tile(
                np.repeat([1.0 / hh for hh, _ in spatial_shapes], P_), h_
            )
            sxy = jnp.asarray(np.concatenate([inv_w, inv_h]), f32)  # (2*HLP,)

            # reference points in q-major layout (bs, K, L, 2)
            assert reference_points.shape == (bs, K, L_, 2), reference_points.shape
            ref = reference_points.astype(f32)
            # (bs, K, L, 2) -> (bs, K, 2*HLP) with the same flat pattern:
            # per coordinate, per head, L levels each repeated P times
            ref_rep = jnp.tile(
                jnp.repeat(
                    jnp.moveaxis(ref, -1, 2).reshape(bs, K, 2 * L_), P_, axis=-1
                ).reshape(bs, K, 2, L_ * P_),
                (1, 1, 1, h_),
            ).reshape(bs, K, 2 * HLP)
            xy = ref_rep + off * sxy  # (bs, K, [x(HLP) | y(HLP)])

            attn = jax.nn.softmax(
                raw_attn.astype(f32).reshape(bs, K, h_, L_ * P_), axis=-1
            ).reshape(bs, K, HLP)
            # calibration capture (ops/msda_calibrate.calibrate_model):
            # inert unless apply() passes mutable=["intermediates"]
            self.sow("intermediates", "sampling_coords", (xy, attn))
            cpk = jnp.concatenate([xy, attn], axis=-1)
            C = -(-3 * HLP // 128) * 128  # Mosaic lane-tile multiple
            if C != 3 * HLP:
                cpk = jnp.pad(cpk, ((0, 0), (0, 0), (0, C - 3 * HLP)))
            out = msda_grid_packed(
                v, spatial_shapes, cpk, P_, impl=self.impl,
                radius=self.grid_radius or c.grid_radius,
                correction_budget=c.correction_budget,
            )
            out = out.astype(self.dtype)
            out = dense(c.embed_dims, "output_proj")(out)
            return out + identity

        if self.grid_queries:
            # legacy q-minor pipeline (impl="grid" / "grid_pallas" research
            # paths): the query axis stays MINOR through every coordinate
            # tensor; one clean (bs,K,F)->(bs,F,K) transpose, then reshapes
            # only split the MAJOR axis (free).
            h_, L_, P_ = c.num_heads, c.num_levels, c.num_points
            K = num_query
            f32 = jnp.float32
            # projection emits [x-block | y-block] (see _grid_offset_bias):
            # (bs, K, 2*h*L*P) -> q-minor (bs, 2, h, L, P, K) -> (..., 2, K)
            off_qm = jnp.moveaxis(
                raw_offsets.astype(f32).transpose(0, 2, 1).reshape(
                    bs, 2, h_, L_, P_, K
                ),
                1,
                -2,
            )
            attn_qm = raw_attn.astype(f32).transpose(0, 2, 1).reshape(bs, h_, L_ * P_, K)
            attn_qm = jax.nn.softmax(attn_qm, axis=2).reshape(bs, h_, L_, P_, K)

            # reference points arrive q-major (bs, K, L, 2); q-minor view
            assert reference_points.shape == (bs, K, L_, 2), reference_points.shape
            ref_qm = reference_points.astype(f32).transpose(0, 2, 3, 1)  # (bs,L,2,K)
            norm_x = jnp.asarray([ww for _, ww in spatial_shapes], f32)
            norm_y = jnp.asarray([hh for hh, _ in spatial_shapes], f32)
            bcast = (None, None, slice(None), None, None)
            x = ref_qm[:, None, :, 0, None, :] + off_qm[..., 0, :] / norm_x[bcast]
            y = ref_qm[:, None, :, 1, None, :] + off_qm[..., 1, :] / norm_y[bcast]

            out = msda_grid_qm(
                v, spatial_shapes, x, y, attn_qm,
                impl=self.impl, radius=self.grid_radius or c.grid_radius,
                correction_budget=c.correction_budget,
            )
            out = out.astype(self.dtype)
            out = dense(c.embed_dims, "output_proj")(out)
            return out + identity

        # deinterleaved [x | y] projection layout -> (..., 2) minor (the
        # decoder's 900 queries make this transpose negligible)
        offsets = jnp.moveaxis(
            raw_offsets.reshape(
                bs, num_query, 2, c.num_heads, c.num_levels, c.num_points
            ),
            2,
            -1,
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

        if use_table:
            # one gathered row per tap from the shared raw-memory corner
            # table, then THIS layer's value_proj applied to the tiny
            # interpolated result: out_h = W_h @ interp_h + b_h * wsum_h
            # (wsum = interpolated unmasked-indicator channel, so the bias
            # drops at out-of-image corners and masked keys exactly like the
            # reference's masked_fill-after-proj).
            from codetr_tpu.ops.msda_dectab import msda_from_raw_table

            interp = msda_from_raw_table(
                raw_table, spatial_shapes, loc, attn.astype(jnp.float32)
            )  # (bs, nq, h, Cm) f32
            cin = interp.shape[-1] - 1
            feats = interp[..., :cin].astype(self.dtype)
            wsum = interp[..., cin]
            vp = dense(value_proj_size, "value_proj")
            dh = value_proj_size // c.num_heads
            full = vp(feats).reshape(bs, num_query, c.num_heads, c.num_heads, dh)
            # head h of the output only needs W's columns for head h — take
            # the (h, h) diagonal blocks of the redundant full projection
            # (8x the MACs of the exact slice einsum, still ~1 GFLOP)
            outh = jnp.moveaxis(jnp.diagonal(full, axis1=2, axis2=3), -1, 2)
            bias = vp(jnp.zeros((cin,), self.dtype))  # (value_proj_size,)
            outh = outh + bias.reshape(c.num_heads, dh) * (
                wsum[..., None].astype(self.dtype) - 1.0
            )
            out = outh.reshape(bs, num_query, value_proj_size)
        else:
            out = multi_scale_deformable_attention(
                v, spatial_shapes, loc, attn, impl=self.impl, grid_queries=False,
            )
        out = dense(c.embed_dims, "output_proj")(out)
        return out + identity
