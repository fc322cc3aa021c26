"""Decoder cross-attention MSDA on a shared RAW-memory corner table.

The 6 scanned decoder layers all sample the SAME encoder memory; only their
``value_proj`` weights differ.  Bilinear interpolation is linear, so the
projection commutes with the sampling:

    out_h = W_h @ (sum_taps cw * mem[tap]) + b_h * (sum_taps cw)

This lets ONE pitched 4-corner gather table be built from the raw
(unprojected) memory OUTSIDE the decoder scan and shared by all 6 layers;
each layer then gathers ONE row per (query, head, level, point) tap —
144k rows at 900 queries vs the per-layer pair gather's 288k — and applies
its own ``value_proj`` AFTER interpolation on the tiny (bs, 900, h, C)
result (~0.1 GFLOP).  XLA's row gather is row-count-bound at ~60-85M rows/s
on this chip (ROUND3_NOTES.md), so halving rows halves the decoder's MSDA
gather time; the table build (~1.45x the memory bytes, 4 corners) happens
once instead of never being possible per-layer (its cost dominated the
per-layer pitched variant, ROUND4_NOTES.md coarse A/B).

Masking semantics: the reference zeroes PROJECTED values at padded keys
(multi_scale_deformable_attention.py:137-140: ``value.masked_fill(mask, 0)``
after value_proj), i.e. a masked key contributes neither W@mem nor the bias.
The table therefore stores the raw memory zeroed at masked keys PLUS an
"unmasked" indicator channel; interpolating the indicator with the same
corner weights yields exactly the bias multiplier ``sum cw * unmasked`` for
arbitrary (even non-rectangular) masks.

Reference for the sampling math being reproduced: grid_sample bilinear/zeros
as invoked at codetr/ops.py:171-173; table layout as msda_pitched_gather_qm
(ops/msda.py:186-311) but batch-shared across heads (raw memory has no head
split).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codetr_tpu.ops.msda import _take_rows

Shapes = Tuple[Tuple[int, int], ...]


def _pitch_meta(spatial_shapes: Shapes):
    pitch = max(w for _, w in spatial_shapes)
    heights = np.asarray([hh for hh, _ in spatial_shapes], np.int32)
    row_base = np.concatenate([[0], np.cumsum(heights * pitch)])
    return pitch, row_base, int(row_base[-1])


@partial(jax.jit, static_argnames=("spatial_shapes",))
def build_raw_quad_table(
    mem_aug: jax.Array,  # (bs, K, Cm) raw memory (+ indicator channel)
    spatial_shapes: Shapes,
) -> jax.Array:
    """Pitched 4-corner table over the raw memory: row k of the pitched
    layout carries ``[m[k] | m[k+1] | m[k+pitch] | m[k+pitch+1]]`` so one
    gathered row serves all four bilinear corners of a tap.  Returns
    (bs * R, 4 * Cm) in ``mem_aug.dtype``; wrap rows from the rolls are only
    ever read with zero corner validity (row starts are clamped inside each
    level, exactly as msda_pitched_gather_qm)."""
    bs, K, Cm = mem_aug.shape
    pitch, row_base, R = _pitch_meta(spatial_shapes)
    lvl_start = np.concatenate(
        [[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])]
    )
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        t0 = int(lvl_start[lvl])
        m_l = jax.lax.slice_in_dim(mem_aug, t0, t0 + Hl * Wl, axis=1)
        m_l = m_l.reshape(bs, Hl, Wl, Cm)
        m_l = jnp.pad(m_l, ((0, 0), (0, 0), (0, pitch - Wl), (0, 0)))
        parts.append(m_l.reshape(bs, Hl * pitch, Cm))
    pitched = jnp.concatenate(parts, axis=1).reshape(bs * R, Cm)
    return jnp.concatenate(
        [
            pitched,
            jnp.roll(pitched, -1, axis=0),
            jnp.roll(pitched, -pitch, axis=0),
            jnp.roll(pitched, -(pitch + 1), axis=0),
        ],
        axis=1,
    )  # (bs*R, 4*Cm)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_from_raw_table(
    table4: jax.Array,  # (bs*R, 4*Cm) from build_raw_quad_table
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,  # (bs, Q, h, L, P, 2) normalized xy
    attention_weights: jax.Array,  # (bs, Q, h, L, P)
) -> jax.Array:
    """Interpolate raw memory at every tap and reduce over (level, point):
    returns (bs, Q, h, Cm) f32 ``sum_{l,p} cw * mem_aug[tap]`` with cw =
    attention weight x bilinear corner weights x in-image validity — the
    pre-projection sufficient statistic of MSDA for each head."""
    N4, C4 = table4.shape
    Cm = C4 // 4
    bs, Q, h, L, P, _ = sampling_locations.shape
    assert attention_weights.shape == (bs, Q, h, L, P)
    pitch, row_base, R = _pitch_meta(spatial_shapes)
    assert N4 % R == 0 and N4 // R == bs, (N4, R, bs)
    f32 = jnp.float32

    widths = np.asarray([ww for _, ww in spatial_shapes], np.int32)
    heights = np.asarray([hh for hh, _ in spatial_shapes], np.int32)
    # broadcast over (bs, Q, h, L, P): level axis = 3
    ax = (None, None, None, slice(None), None)
    Wl_b = jnp.asarray(widths)[ax]
    Hl_b = jnp.asarray(heights)[ax]
    base_b = jnp.asarray(row_base[:-1], jnp.int32)[ax]
    sizes_x = jnp.asarray(widths, f32)[ax]
    sizes_y = jnp.asarray(heights, f32)[ax]
    b_off = (jnp.arange(bs, dtype=jnp.int32) * R)[:, None, None, None, None]

    x = sampling_locations[..., 0].astype(f32) * sizes_x - 0.5
    y = sampling_locations[..., 1].astype(f32) * sizes_y - 0.5
    attw = attention_weights.astype(f32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # clamp the packed-row start inside the level; corner slots shift under
    # the clamps and validity weights zero out-of-image taps
    cs = jnp.clip(x0i, 0, jnp.maximum(Wl_b - 2, 0))
    rs = jnp.clip(y0i, 0, jnp.maximum(Hl_b - 2, 0))
    dx0 = x0i - cs
    dy0 = y0i - rs

    starts = b_off + base_b + rs * pitch + cs  # (bs, Q, h, L, P)
    rows = _take_rows(table4, starts.reshape(-1)).reshape(*starts.shape, C4)
    quads = [rows[..., i * Cm : (i + 1) * Cm].astype(f32) for i in range(4)]

    out = None
    for cy in (0, 1):
        for cx in (0, 1):
            slot_x = jnp.clip(dx0 + cx, 0, 1)[..., None]
            slot_y = jnp.clip(dy0 + cy, 0, 1)[..., None]
            v01 = jnp.where(slot_x == 0, quads[0], quads[1])
            v23 = jnp.where(slot_x == 0, quads[2], quads[3])
            v = jnp.where(slot_y == 0, v01, v23)
            xi = x0i + cx
            yi = y0i + cy
            valid = (xi >= 0) & (xi < Wl_b) & (yi >= 0) & (yi < Hl_b)
            in_pack = (
                (dy0 + cy >= 0) & (dy0 + cy <= 1)
                & (dx0 + cx >= 0) & (dx0 + cx <= 1)
            )
            wx = tx if cx == 1 else (1.0 - tx)
            wy = ty if cy == 1 else (1.0 - ty)
            cw = (wx * wy * (valid & in_pack).astype(f32) * attw)[..., None]
            term = v * cw
            out = term if out is None else out + term
    return out.sum(axis=(3, 4))  # (bs, Q, h, Cm)
