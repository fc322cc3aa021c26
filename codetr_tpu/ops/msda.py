"""Multi-scale deformable attention — the single custom op of Co-DETR.

The reference implements this three ways: a CUDA kernel
(codetr/csrc/ms_deform_attn.cu:211-261 forward), a pure-PyTorch grid_sample
fallback (codetr/ops.py:129-186), and a TensorRT IPluginV3 plugin
(codetr/csrc/deformable_attention_plugin.cpp).  The TPU build provides:

- ``multi_scale_deformable_attention_reference`` (this file): the exact
  any-offset implementation.  TPU-tuned formulation: one flat
  ``lax.gather`` of 2-wide row slices over the level-concatenated,
  batch-flattened value table (measured ~25x faster than a batched
  take_along_axis formulation on TPU, with second-scale compiles).  Used as
  the oracle everywhere and as the runtime path for small query counts
  (decoder cross-attention: 900 queries).
- ``codetr_tpu.ops.msda_grid.msda_grid_shift``: gather-free shift-window
  reformulation for grid queries (encoder self-attention) — see its module
  docstring for the TPU-first rationale.
- a Pallas kernel (msda_pallas.py) built on the shift-window design for the
  VMEM-resident hot path.

Sampling semantics (must match torch.nn.functional.grid_sample with
``mode='bilinear', padding_mode='zeros', align_corners=False`` as invoked at
codetr/ops.py:171-173): a normalized location ``loc`` in [0, 1] maps to pixel
coordinate ``loc * size - 0.5``; 4 bilinear taps; taps whose integer corner
falls outside the feature map contribute zero.

Shapes (batch-first, matching the reference op schema
codetr/csrc/deformable_attention_torch.cpp:16-24):
  value:              (bs, num_keys, num_heads, head_dims)
  spatial_shapes:     static tuple ((H0,W0), ..., (H{L-1},W{L-1}))
  sampling_locations: (bs, num_queries, num_heads, num_levels, num_points, 2)  xy in [0,1]
  attention_weights:  (bs, num_queries, num_heads, num_levels, num_points)
  returns:            (bs, num_queries, num_heads * head_dims)

``spatial_shapes`` is a *static* python tuple — XLA needs static shapes
anyway, and this removes the reference's level_start_index tensor entirely
(start indices become compile-time constants).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


def _take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table (N, d); idx (M,) int32 (in-bounds) -> (M, d)."""
    return jax.lax.gather(
        table,
        idx[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        ),
        slice_sizes=(1, table.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


@partial(jax.jit, static_argnames=("spatial_shapes", "q_chunk"))
def msda_reference_qm(
    value: jax.Array,
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, Q) normalized x in [0,1]
    y: jax.Array,  # (bs, h, L, P, Q) normalized y in [0,1]
    w: jax.Array,  # (bs, h, L, P, Q) attention weights
    q_chunk: int = 8192,
) -> jax.Array:
    """Exact MSDA (semantics of codetr/ops.py:129-186), flat-gather form, on
    q-minor coordinates.

    TPU layout notes: taps are processed in a tap-major/q-minor layout (the
    large query axis last — small trailing dims get tile-padded to (8, 128)
    with up to 50x memory waste; the model produces coordinates in this
    layout end-to-end), and queries are chunked with ``lax.map`` so the
    materialized tap tensors stay bounded at encoder scale (~12M points).
    """
    bs, K, h, d = value.shape
    Q = x.shape[-1]
    L = len(spatial_shapes)
    P = x.shape[3]
    assert x.shape == y.shape == w.shape == (bs, h, L, P, Q)
    f32 = jnp.promote_types(value.dtype, jnp.float32)

    table = value.transpose(0, 2, 1, 3).reshape(bs * h * K, d)

    widths = np.asarray([ww for _, ww in spatial_shapes], np.int32)
    heights = np.asarray([hh for hh, _ in spatial_shapes], np.int32)
    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])[:-1]
    # broadcast shapes over (bs, h, L, P, Qc): level axis = 2
    Wl = jnp.asarray(widths)[None, None, :, None, None]
    Hl = jnp.asarray(heights)[None, None, :, None, None]
    start_l = jnp.asarray(lvl_start, jnp.int32)[None, None, :, None, None]
    sizes_x = jnp.asarray(widths, f32)[None, None, :, None, None]
    sizes_y = jnp.asarray(heights, f32)[None, None, :, None, None]
    bh_off = (jnp.arange(bs * h, dtype=jnp.int32) * K).reshape(bs, h)[:, :, None, None, None]

    coord_t = jnp.promote_types(x.dtype, f32)
    loc_x = x.astype(coord_t)
    loc_y = y.astype(coord_t)
    attw = w.astype(f32)

    qc = min(q_chunk, Q)
    n_chunks = -(-Q // qc)
    q_pad = n_chunks * qc
    if q_pad != Q:
        pad = [(0, 0)] * 4 + [(0, q_pad - Q)]
        loc_x, loc_y, attw = (jnp.pad(a, pad) for a in (loc_x, loc_y, attw))
    # (n_chunks, bs, h, L, P, qc)
    loc_x, loc_y, attw = (
        jnp.moveaxis(a.reshape(bs, h, L, P, n_chunks, qc), 4, 0)
        for a in (loc_x, loc_y, attw)
    )

    def one_chunk(args):
        x_c, y_c, w_c = args  # (bs,h,L,P,qc) each
        x = x_c * sizes_x - 0.5  # (bs,h,L,P,qc)
        y = y_c * sizes_y - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(f32)
        ty = (y - y0).astype(f32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = None
        for cdx, cdy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            xi = x0i + cdx
            yi = y0i + cdy
            valid = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
            flat = bh_off + start_l + jnp.clip(yi, 0, Hl - 1) * Wl + jnp.clip(xi, 0, Wl - 1)
            rows = _take_rows(table, flat.reshape(-1)).reshape(*flat.shape, d)
            wx = tx if cdx == 1 else (1.0 - tx)
            wy = ty if cdy == 1 else (1.0 - ty)
            cw = (wx * wy * valid.astype(f32) * w_c)[..., None]
            term = rows.astype(f32) * cw
            acc = term if acc is None else acc + term
        # (bs, h, L, P, qc, d) -> sum levels/points -> (bs, h, qc, d)
        return acc.sum(axis=(2, 3))

    if n_chunks == 1:
        out = one_chunk((loc_x[0], loc_y[0], attw[0]))[None]
    else:
        out = jax.lax.map(one_chunk, (loc_x, loc_y, attw))  # (n_chunks, bs, h, qc, d)
    out = jnp.moveaxis(out, 0, 2).reshape(bs, h, q_pad, d)[:, :, :Q]
    return out.astype(value.dtype).transpose(0, 2, 1, 3).reshape(bs, Q, h * d)


@partial(jax.jit, static_argnames=("spatial_shapes", "q_chunk"))
def multi_scale_deformable_attention_reference(
    value: jax.Array,
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    q_chunk: int = 8192,
) -> jax.Array:
    """Exact MSDA on the reference op layout (deformable_attention_torch.cpp
    schema); thin wrapper transposing into the q-minor core."""
    _check_shapes(value, spatial_shapes, sampling_locations, attention_weights)
    loc = sampling_locations.transpose(0, 2, 3, 4, 5, 1)  # (bs,h,L,P,2,Q)
    attw = attention_weights.transpose(0, 2, 3, 4, 1)  # (bs,h,L,P,Q)
    return msda_reference_qm(
        value, spatial_shapes, loc[..., 0, :], loc[..., 1, :], attw, q_chunk=q_chunk
    )


@partial(jax.jit, static_argnames=("spatial_shapes", "q_chunk"))
def msda_pitched_gather_qm(
    value: jax.Array,
    spatial_shapes: Shapes,
    x_in: jax.Array,  # (bs, h, L, P, Q) normalized x
    y_in: jax.Array,  # (bs, h, L, P, Q)
    w_in: jax.Array,  # (bs, h, L, P, Q)
    q_chunk: int = 8192,
) -> jax.Array:
    """Exact MSDA, ONE gather row per tap: every level's rows are padded to
    a common pitch, so the y-neighbor lives at a CONSTANT +pitch offset for
    all levels and a single flat table can pack all four bilinear corners
    [k, k+1, k+pitch, k+pitch+1] per row.

    vs msda_pair_gather_qm this halves the gather rows again while keeping
    ONE gather (the per-level-table variant lost to per-gather overheads);
    the pitched table costs Σ Hl*pitch / Σ Hl*Wl ≈ 1.45x the value bytes.
    """
    bs, K, h, d = value.shape
    Q = x_in.shape[-1]
    L = len(spatial_shapes)
    P = x_in.shape[3]
    assert x_in.shape == y_in.shape == w_in.shape == (bs, h, L, P, Q)
    f32 = jnp.promote_types(value.dtype, jnp.float32)

    pitch = max(w for _, w in spatial_shapes)
    heights = np.asarray([hh for hh, _ in spatial_shapes], np.int32)
    widths = np.asarray([ww for _, ww in spatial_shapes], np.int32)
    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])
    # pitched row base of each level, in pitched-table rows
    row_base = np.concatenate([[0], np.cumsum(heights * pitch)])
    R = int(row_base[-1])

    value_hm = value.transpose(0, 2, 1, 3).reshape(bs * h, K, d)
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        t0 = int(lvl_start[lvl])
        v_l = jax.lax.slice_in_dim(value_hm, t0, t0 + Hl * Wl, axis=1)
        v_l = v_l.reshape(bs * h, Hl, Wl, d)
        v_l = jnp.pad(v_l, ((0, 0), (0, 0), (0, pitch - Wl), (0, 0)))
        parts.append(v_l.reshape(bs * h, Hl * pitch, d))
    pitched = jnp.concatenate(parts, axis=1).reshape(bs * h * R, d)
    table4 = jnp.concatenate(
        [
            pitched,
            jnp.roll(pitched, -1, axis=0),
            jnp.roll(pitched, -pitch, axis=0),
            jnp.roll(pitched, -(pitch + 1), axis=0),
        ],
        axis=1,
    )  # (bs*h*R, 4d); wrap rows only ever read with zero validity weight

    Wl_b = jnp.asarray(widths)[None, None, :, None, None]
    Hl_b = jnp.asarray(heights)[None, None, :, None, None]
    base_b = jnp.asarray(row_base[:-1], jnp.int32)[None, None, :, None, None]
    sizes_x = jnp.asarray(widths, f32)[None, None, :, None, None]
    sizes_y = jnp.asarray(heights, f32)[None, None, :, None, None]
    bh_off = (jnp.arange(bs * h, dtype=jnp.int32) * R).reshape(bs, h)[
        :, :, None, None, None
    ]

    coord_t = jnp.promote_types(x_in.dtype, f32)
    loc_x = x_in.astype(coord_t)
    loc_y = y_in.astype(coord_t)
    attw_all = w_in.astype(f32)

    qc = min(q_chunk, Q)
    n_chunks = -(-Q // qc)
    q_pad = n_chunks * qc
    if q_pad != Q:
        pad = [(0, 0)] * 4 + [(0, q_pad - Q)]
        loc_x, loc_y, attw_all = (jnp.pad(a, pad) for a in (loc_x, loc_y, attw_all))
    loc_x, loc_y, attw_all = (
        jnp.moveaxis(a.reshape(bs, h, L, P, n_chunks, qc), 4, 0)
        for a in (loc_x, loc_y, attw_all)
    )

    def one_chunk(args):
        x_c, y_c, attw = args
        x = x_c * sizes_x - 0.5
        y = y_c * sizes_y - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(f32)
        ty = (y - y0).astype(f32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # clamp the packed-row start inside the level; the corner slots
        # shift under the clamps and validity weights zero out-of-image taps
        cs = jnp.clip(x0i, 0, jnp.maximum(Wl_b - 2, 0))
        rs = jnp.clip(y0i, 0, jnp.maximum(Hl_b - 2, 0))
        dx0 = (x0i - cs)[..., None]
        dy0 = (y0i - rs)[..., None]

        starts = bh_off + base_b + rs * pitch + cs
        rows = _take_rows(table4, starts.reshape(-1)).reshape(*starts.shape, 4 * d)
        quads = [rows[..., i * d : (i + 1) * d].astype(f32) for i in range(4)]

        out = None
        for cy in (0, 1):
            for cx in (0, 1):
                slot_x = jnp.clip(dx0 + cx, 0, 1)
                slot_y = jnp.clip(dy0 + cy, 0, 1)
                v01 = jnp.where(slot_x == 0, quads[0], quads[1])
                v23 = jnp.where(slot_x == 0, quads[2], quads[3])
                v = jnp.where(slot_y == 0, v01, v23)
                xi = x0i + cx
                yi = y0i + cy
                valid = (xi >= 0) & (xi < Wl_b) & (yi >= 0) & (yi < Hl_b)
                in_pack = (
                    (dy0[..., 0] + cy >= 0) & (dy0[..., 0] + cy <= 1)
                    & (dx0[..., 0] + cx >= 0) & (dx0[..., 0] + cx <= 1)
                )
                wx = tx if cx == 1 else (1.0 - tx)
                wy = ty if cy == 1 else (1.0 - ty)
                cw = (wx * wy * (valid & in_pack).astype(f32) * attw)[..., None]
                term = v * cw
                out = term if out is None else out + term
        return out.sum(axis=(2, 3))  # (bs, h, qc, d)

    if n_chunks == 1:
        out = one_chunk((loc_x[0], loc_y[0], attw_all[0]))[None]
    else:
        out = jax.lax.map(one_chunk, (loc_x, loc_y, attw_all))
    out = jnp.moveaxis(out, 0, 2).reshape(bs, h, q_pad, d)[:, :, :Q]
    return out.astype(value.dtype).transpose(0, 2, 1, 3).reshape(bs, Q, h * d)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_quad_gather(
    value: jax.Array,
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Exact MSDA for small query counts: ONE gathered row per tap carrying
    all four bilinear corners.

    Per level l, a quad table packs [v[k], v[k+1], v[k+W_l], v[k+W_l+1]] into
    row k, so each (query, head, level, point) needs a single gather row —
    half of msda_pair_gather's two and a quarter of the naive four.  The
    measured TPU gather rate is row-count-bound and width-independent, so
    this halves the decoder's cross-attention gather time again.  Row starts
    are clamped inside the level (corner selection shifts compensate,
    validity weights zero any out-of-image taps) — W_l varies per level,
    hence per-level tables and per-level gathers.
    """
    _check_shapes(value, spatial_shapes, sampling_locations, attention_weights)
    bs, K, h, d = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    f32 = jnp.promote_types(value.dtype, jnp.float32)

    coord_t = jnp.promote_types(sampling_locations.dtype, f32)
    loc = sampling_locations.astype(coord_t).transpose(0, 2, 3, 4, 5, 1)  # (bs,h,L,P,2,Q)
    attw = attention_weights.astype(f32).transpose(0, 2, 3, 4, 1)  # (bs,h,L,P,Q)

    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])
    value_hm = value.transpose(0, 2, 1, 3).reshape(bs * h, K, d)

    out = jnp.zeros((bs, h, Q, d), f32)
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        t0 = int(lvl_start[lvl])
        v_l = jax.lax.slice_in_dim(value_hm, t0, t0 + Hl * Wl, axis=1)
        n = Hl * Wl
        flat = v_l.reshape(bs * h * n, d)
        # quad rows: [k, k+1, k+Wl, k+Wl+1] — rolls wrap across image/batch
        # rows but those entries are only read with zero validity weight
        table4 = jnp.concatenate(
            [
                flat,
                jnp.roll(flat, -1, axis=0),
                jnp.roll(flat, -Wl, axis=0),
                jnp.roll(flat, -(Wl + 1), axis=0),
            ],
            axis=1,
        )  # (bs*h*n, 4d)

        x = loc[:, :, lvl, :, 0] * Wl - 0.5  # (bs, h, P, Q)
        y = loc[:, :, lvl, :, 1] * Hl - 0.5
        w_l = attw[:, :, lvl]  # (bs, h, P, Q)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(f32)
        ty = (y - y0).astype(f32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        cs = jnp.clip(x0i, 0, max(Wl - 2, 0))
        rs = jnp.clip(y0i, 0, max(Hl - 2, 0))
        dx0 = (x0i - cs)[..., None]  # 0 when unclamped
        dy0 = (y0i - rs)[..., None]
        bh_off = (jnp.arange(bs * h, dtype=jnp.int32) * n).reshape(bs, h)[
            :, :, None, None
        ]
        starts = bh_off + rs * Wl + cs
        rows = _take_rows(table4, starts.reshape(-1)).reshape(*starts.shape, 4 * d)
        quads = [rows[..., i * d : (i + 1) * d].astype(f32) for i in range(4)]

        def corner(cy, cx):
            # packed slot for image corner (y0+cy, x0+cx): shifted by the
            # clamps; out-of-pack slots only occur with zero validity
            slot_y = jnp.clip(dy0 + cy, 0, 1)
            slot_x = jnp.clip(dx0 + cx, 0, 1)
            v01 = jnp.where(slot_x == 0, quads[0], quads[1])
            v23 = jnp.where(slot_x == 0, quads[2], quads[3])
            v = jnp.where(slot_y == 0, v01, v23)
            xi = x0i + cx
            yi = y0i + cy
            valid = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
            # the pack only holds the true corner when the clamp shift kept
            # it in range; clamped-out corners are invalid anyway
            in_pack = (dy0[..., 0] + cy >= 0) & (dy0[..., 0] + cy <= 1) & (
                dx0[..., 0] + cx >= 0
            ) & (dx0[..., 0] + cx <= 1)
            wx = tx if cx == 1 else (1.0 - tx)
            wy = ty if cy == 1 else (1.0 - ty)
            cw = (wx * wy * (valid & in_pack).astype(f32) * w_l)[..., None]
            return v * cw

        contrib = (
            corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)
        )  # (bs, h, P, Q, d)
        out = out + contrib.sum(axis=2)

    return out.astype(value.dtype).transpose(0, 2, 1, 3).reshape(bs, Q, h * d)


@partial(jax.jit, static_argnames=("spatial_shapes", "q_chunk"))
def msda_pair_gather_qm(
    value: jax.Array,
    spatial_shapes: Shapes,
    x_in: jax.Array,  # (bs, h, L, P, Q) normalized x
    y_in: jax.Array,  # (bs, h, L, P, Q)
    w_in: jax.Array,  # (bs, h, L, P, Q)
    q_chunk: int = 8192,
) -> jax.Array:
    """Exact MSDA, pair-gather form, q-minor coordinates: each bilinear
    corner PAIR is one row of a column-pair-packed table — half the gather
    rows of the 4-corner oracle.  The measured TPU gather rate at encoder
    scale is row-count-bound and width-independent, making this the fastest
    exact MSDA measured on this hardware (ratio-calibrated: ~3.9 ms/call at
    608x608 encoder shapes vs 7.9 ms for the oracle and 26+ ms for every
    shift-window sweep variant — see ROUND2_NOTES.md).
    """
    bs, K, h, d = value.shape
    Q = x_in.shape[-1]
    L = len(spatial_shapes)
    P = x_in.shape[3]
    assert x_in.shape == y_in.shape == w_in.shape == (bs, h, L, P, Q)
    f32 = jnp.promote_types(value.dtype, jnp.float32)

    table = value.transpose(0, 2, 1, 3).reshape(bs * h * K, d)
    # row k of table2 = [table[k], table[k+1]]; starts are clamped to N-2
    table2 = jnp.concatenate([table, jnp.roll(table, -1, axis=0)], axis=1)

    widths = np.asarray([w for _, w in spatial_shapes], np.int32)
    heights = np.asarray([hh for hh, _ in spatial_shapes], np.int32)
    lvl_start = np.concatenate([[0], np.cumsum([hh * w for hh, w in spatial_shapes])])[:-1]
    Wl = jnp.asarray(widths)[None, None, :, None, None]
    Hl = jnp.asarray(heights)[None, None, :, None, None]
    start_l = jnp.asarray(lvl_start, jnp.int32)[None, None, :, None, None]
    sizes_x = jnp.asarray(widths, f32)[None, None, :, None, None]
    sizes_y = jnp.asarray(heights, f32)[None, None, :, None, None]
    bh_off = (jnp.arange(bs * h, dtype=jnp.int32) * K).reshape(bs, h)[:, :, None, None, None]

    coord_t = jnp.promote_types(x_in.dtype, f32)
    loc_x = x_in.astype(coord_t)
    loc_y = y_in.astype(coord_t)
    attw_all = w_in.astype(f32)

    # chunk the query axis (lax.map) so the materialized (bs,h,L,P,qc,2d)
    # row tensors stay bounded — unchunked at 1920x1280 encoder scale they
    # exceed HBM (measured 17.2G > 15.75G)
    qc = min(q_chunk, Q)
    n_chunks = -(-Q // qc)
    q_pad = n_chunks * qc
    if q_pad != Q:
        pad = [(0, 0)] * 4 + [(0, q_pad - Q)]
        loc_x, loc_y, attw_all = (jnp.pad(a, pad) for a in (loc_x, loc_y, attw_all))
    loc_x, loc_y, attw_all = (
        jnp.moveaxis(a.reshape(bs, h, L, P, n_chunks, qc), 4, 0)
        for a in (loc_x, loc_y, attw_all)
    )

    def one_chunk(args):
        x_c, y_c, attw = args  # (bs,h,L,P,qc)
        x = x_c * sizes_x - 0.5
        y = y_c * sizes_y - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(f32)
        ty = (y - y0).astype(f32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # W==1 levels would give Wl-2 == -1 and a negative flat start fed to
        # a PROMISE_IN_BOUNDS gather (UB) — clamp the pair start to >= 0;
        # the validity weights already zero the contributions.
        cs = jnp.clip(x0i, 0, jnp.maximum(Wl - 2, 0))
        d0 = (x0i - cs)[..., None]  # -1/0/1 (wider when Wl == 1; weights 0)

        def wgt(xi, yi, wx, wy):
            valid = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
            return (wx * wy * valid.astype(f32) * attw)[..., None]

        out = None
        for cdy in (0, 1):
            yi = y0i + cdy
            starts = bh_off + start_l + jnp.clip(yi, 0, Hl - 1) * Wl + cs
            rows = _take_rows(table2, starts.reshape(-1)).reshape(*starts.shape, 2 * d)
            s0, s1 = rows[..., :d].astype(f32), rows[..., d:].astype(f32)
            c_x0 = jnp.where(d0 == 0, s0, s1)
            c_x1 = jnp.where(d0 == -1, s0, s1)
            wy = ty if cdy == 1 else (1.0 - ty)
            term = c_x0 * wgt(x0i, yi, 1.0 - tx, wy) + c_x1 * wgt(x0i + 1, yi, tx, wy)
            out = term if out is None else out + term
        return out.sum(axis=(2, 3))  # (bs, h, qc, d)

    if n_chunks == 1:
        out = one_chunk((loc_x[0], loc_y[0], attw_all[0]))[None]
    else:
        out = jax.lax.map(one_chunk, (loc_x, loc_y, attw_all))
    out = jnp.moveaxis(out, 0, 2).reshape(bs, h, q_pad, d)[:, :, :Q]
    return out.astype(value.dtype).transpose(0, 2, 1, 3).reshape(bs, Q, h * d)


@partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def msda_pair_gather_qm_ad(value, spatial_shapes, x_in, y_in, w_in, q_chunk=8192):
    """``msda_pair_gather_qm`` with a FUSED custom backward on the same
    pair-table geometry (round-2 VERDICT item 7).

    XLA's AD of the 4-corner oracle scatters/gathers 4 rows per tap in the
    backward; this VJP keeps the pair packing there too: grad-of-value is
    TWO ``segment_sum`` scatter-adds per tap (one per packed column, folded
    back with a roll — the adjoint of the forward's ``table2`` construction)
    and grad-of-coords/weights re-gathers the same 2 rows per tap the forward
    read.  Backward row traffic is halved vs oracle AD, matching the
    forward's measured rows-bound advantage.  (Reference analog: the tuned
    col2im backward kernels, ms_deform_attn.cu:433-897.)
    """
    return msda_pair_gather_qm(value, spatial_shapes, x_in, y_in, w_in, q_chunk=q_chunk)


def _pair_gather_ad_fwd(value, spatial_shapes, x_in, y_in, w_in, q_chunk=8192):
    out = msda_pair_gather_qm(value, spatial_shapes, x_in, y_in, w_in, q_chunk=q_chunk)
    return out, (value, x_in, y_in, w_in)


def _pair_gather_ad_bwd(spatial_shapes, q_chunk, res, g):
    value, x_in, y_in, w_in = res
    bs, K, h, d = value.shape
    Q = x_in.shape[-1]
    L = len(spatial_shapes)
    P = x_in.shape[3]
    f32 = jnp.promote_types(jnp.promote_types(value.dtype, x_in.dtype), jnp.float32)

    table = value.transpose(0, 2, 1, 3).reshape(bs * h * K, d)
    table2 = jnp.concatenate([table, jnp.roll(table, -1, axis=0)], axis=1)
    N = bs * h * K

    widths = np.asarray([w for _, w in spatial_shapes], np.int32)
    heights = np.asarray([hh for hh, _ in spatial_shapes], np.int32)
    lvl_start = np.concatenate([[0], np.cumsum([hh * w for hh, w in spatial_shapes])])[:-1]
    Wl = jnp.asarray(widths)[None, None, :, None, None]
    Hl = jnp.asarray(heights)[None, None, :, None, None]
    start_l = jnp.asarray(lvl_start, jnp.int32)[None, None, :, None, None]
    sizes_x = jnp.asarray(widths, f32)[None, None, :, None, None]
    sizes_y = jnp.asarray(heights, f32)[None, None, :, None, None]
    bh_off = (jnp.arange(bs * h, dtype=jnp.int32) * K).reshape(bs, h)[:, :, None, None, None]

    # g arrives in the op's output layout (bs, Q, h*d) -> (bs, h, Q, d) f32
    g_qm = g.reshape(bs, Q, h, d).transpose(0, 2, 1, 3).astype(f32)

    qc = min(q_chunk, Q)
    n_chunks = -(-Q // qc)
    q_pad = n_chunks * qc
    loc_x, loc_y, attw_all = (a.astype(f32) for a in (x_in, y_in, w_in))
    if q_pad != Q:
        pad5 = [(0, 0)] * 4 + [(0, q_pad - Q)]
        loc_x, loc_y, attw_all = (jnp.pad(a, pad5) for a in (loc_x, loc_y, attw_all))
        g_qm = jnp.pad(g_qm, [(0, 0), (0, 0), (0, q_pad - Q), (0, 0)])
    loc_x, loc_y, attw_all = (
        jnp.moveaxis(a.reshape(bs, h, L, P, n_chunks, qc), 4, 0)
        for a in (loc_x, loc_y, attw_all)
    )
    g_ch = jnp.moveaxis(g_qm.reshape(bs, h, n_chunks, qc, d), 2, 0)

    def one_chunk(carry, args):
        seg0, seg1 = carry  # (N, d) f32 accumulators for the two packed cols
        x_c, y_c, attw, g_c = args  # (bs,h,L,P,qc) x3, (bs,h,qc,d)
        x = x_c * sizes_x - 0.5
        y = y_c * sizes_y - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        cs = jnp.clip(x0i, 0, jnp.maximum(Wl - 2, 0))
        d0 = x0i - cs  # -1/0/1+ packed-slot shift

        valid_x0 = ((x0i >= 0) & (x0i < Wl)).astype(f32)
        valid_x1 = ((x0i + 1 >= 0) & (x0i + 1 < Wl)).astype(f32)
        gb = g_c[:, :, None, None]  # (bs,h,1,1,qc,d)

        d_attw = 0.0
        d_tx = 0.0
        d_ty = 0.0
        for cdy in (0, 1):
            yi = y0i + cdy
            vy = ((yi >= 0) & (yi < Hl)).astype(f32)
            v0 = valid_x0 * vy
            v1 = valid_x1 * vy
            starts = bh_off + start_l + jnp.clip(yi, 0, Hl - 1) * Wl + cs
            rows = _take_rows(table2, starts.reshape(-1)).reshape(*starts.shape, 2 * d)
            s0, s1 = rows[..., :d].astype(f32), rows[..., d:].astype(f32)
            sel0 = (d0 == 0)[..., None]
            sel1 = (d0 == -1)[..., None]
            c_x0 = jnp.where(sel0, s0, s1)
            c_x1 = jnp.where(sel1, s0, s1)
            dot0 = jnp.einsum("bhlpqd,bhlpqd->bhlpq", c_x0, jnp.broadcast_to(gb, c_x0.shape))
            dot1 = jnp.einsum("bhlpqd,bhlpqd->bhlpq", c_x1, jnp.broadcast_to(gb, c_x1.shape))
            wy = ty if cdy == 1 else (1.0 - ty)
            d_attw = d_attw + wy * ((1.0 - tx) * v0 * dot0 + tx * v1 * dot1)
            d_tx = d_tx + wy * attw * (v1 * dot1 - v0 * dot0)
            sgn = 1.0 if cdy == 1 else -1.0
            d_ty = d_ty + sgn * attw * ((1.0 - tx) * v0 * dot0 + tx * v1 * dot1)

            # grad into the two packed columns of table2 (adjoint of the
            # forward's where-selections), scatter-added per row index
            w_x0 = ((1.0 - tx) * wy * v0 * attw)[..., None]
            w_x1 = (tx * wy * v1 * attw)[..., None]
            gs0 = jnp.where(sel0, w_x0, 0.0) + jnp.where(sel1, w_x1, 0.0)
            gs1 = jnp.where(sel0, 0.0, w_x0) + jnp.where(sel1, 0.0, w_x1)
            ids = starts.reshape(-1)
            gb_full = jnp.broadcast_to(gb, c_x0.shape)
            seg0 = seg0 + jax.ops.segment_sum(
                (gs0 * gb_full).reshape(-1, d), ids, num_segments=N
            )
            seg1 = seg1 + jax.ops.segment_sum(
                (gs1 * gb_full).reshape(-1, d), ids, num_segments=N
            )

        d_x = d_tx * sizes_x
        d_y = d_ty * sizes_y
        return (seg0, seg1), (d_x, d_y, d_attw)

    init = (jnp.zeros((N, d), f32), jnp.zeros((N, d), f32))
    if n_chunks == 1:
        (seg0, seg1), (d_x, d_y, d_attw) = one_chunk(
            init, (loc_x[0], loc_y[0], attw_all[0], g_ch[0])
        )
        d_x, d_y, d_attw = d_x[None], d_y[None], d_attw[None]
    else:
        (seg0, seg1), (d_x, d_y, d_attw) = jax.lax.scan(
            one_chunk, init, (loc_x, loc_y, attw_all, g_ch)
        )

    # fold table2 adjoint back to the value table: column 0 hits row k,
    # column 1 hits row k+1 (the wrap row provably receives only zeros)
    g_table = seg0 + jnp.roll(seg1, 1, axis=0)
    g_value = (
        g_table.reshape(bs, h, K, d).transpose(0, 2, 1, 3).astype(value.dtype)
    )

    def unchunk(a):
        out = jnp.moveaxis(a, 0, 4).reshape(bs, h, L, P, q_pad)[..., :Q]
        return out

    return (
        g_value,
        unchunk(d_x).astype(x_in.dtype),
        unchunk(d_y).astype(y_in.dtype),
        unchunk(d_attw).astype(w_in.dtype),
    )


msda_pair_gather_qm_ad.defvjp(_pair_gather_ad_fwd, _pair_gather_ad_bwd)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_pair_gather(
    value: jax.Array,
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Reference-layout wrapper over the q-minor pair-gather core (with the
    fused pair-table backward)."""
    _check_shapes(value, spatial_shapes, sampling_locations, attention_weights)
    loc = sampling_locations.transpose(0, 2, 3, 4, 5, 1)  # (bs,h,L,P,2,Q)
    attw = attention_weights.transpose(0, 2, 3, 4, 1)
    return msda_pair_gather_qm_ad(
        value, spatial_shapes, loc[..., 0, :], loc[..., 1, :], attw, 8192
    )


def _sparse_correction(value, spatial_shapes, x, y, w_out, budget):
    """Exact contribution of up to ``budget`` taps with nonzero weight in
    ``w_out``: compact their flat indices (cumsum-based ``nonzero`` with a
    static size), gather their 4 bilinear corner rows, and scatter-add into
    the output.  Cost is O(K) for the compaction plus O(budget) rows of
    gather/scatter — vs a full masked oracle pass (130/773 ms at the 608 /
    1920 encoder scales, ROUND3_NOTES.md) for even ONE out-of-envelope tap.
    Caller guarantees the true nonzero count <= budget."""
    bs, K, h, d = value.shape
    L = len(spatial_shapes)
    P = x.shape[3]
    f32 = jnp.promote_types(value.dtype, jnp.float32)
    n = bs * h * L * P * K

    active = (w_out != 0).reshape(n)
    (idx,) = jnp.nonzero(active, size=budget, fill_value=0)
    # padded slots duplicate index 0 — gate them off by position
    n_out = jnp.sum(active)
    live = jnp.arange(budget) < n_out

    # flat (bs, h, L, P, K) decomposition
    k_j = (idx % K).astype(jnp.int32)
    rest = idx // K
    p_j = (rest % P).astype(jnp.int32)
    rest = rest // P
    l_j = (rest % L).astype(jnp.int32)
    rest = rest // L
    h_j = (rest % h).astype(jnp.int32)
    b_j = (rest // h).astype(jnp.int32)
    del p_j

    widths = jnp.asarray([ww for _, ww in spatial_shapes], jnp.int32)
    heights = jnp.asarray([hh for hh, _ in spatial_shapes], jnp.int32)
    starts = jnp.asarray(
        np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])[:-1],
        jnp.int32,
    )
    Wt = widths[l_j]
    Ht = heights[l_j]
    s0 = starts[l_j]

    xv = x.reshape(n)[idx].astype(f32) * Wt.astype(f32) - 0.5
    yv = y.reshape(n)[idx].astype(f32) * Ht.astype(f32) - 0.5
    wv = jnp.where(live, w_out.reshape(n)[idx].astype(f32), 0)

    x0 = jnp.floor(xv)
    y0 = jnp.floor(yv)
    fx = xv - x0
    fy = yv - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    table = value.transpose(0, 2, 1, 3).reshape(bs * h * K, d).astype(f32)
    bh_row = (b_j * h + h_j) * K

    contrib = jnp.zeros((budget, d), f32)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            cy = y0i + dy
            cx = x0i + dx
            ok = (cy >= 0) & (cy < Ht) & (cx >= 0) & (cx < Wt)
            cw = jnp.where(ok, wy * wx * wv, 0)
            kk = s0 + jnp.clip(cy, 0, Ht - 1) * Wt + jnp.clip(cx, 0, Wt - 1)
            rows = _take_rows(table, bh_row + kk)  # (budget, d)
            contrib = contrib + cw[:, None] * rows

    # scatter-add into the (bs*K*h, d) view of the output (h-major lanes)
    out_rows = (b_j * K + k_j) * h + h_j
    out = jnp.zeros((bs * K * h, d), f32).at[out_rows].add(contrib)
    return out.reshape(bs, K, h * d)


@partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def _win_exact_ad(value, spatial_shapes, x, y, w, radius, interpret,
                  correction_budget=16384):
    """Envelope-corrected windowed MSDA (exact for arbitrary offsets) with
    the fused pair-table backward.  ``pallas_call`` has no AD rule; since
    the corrected composite IS exact MSDA, its VJP equals the pair-gather
    formulation's VJP — so the backward reuses ``msda_pair_gather_qm_ad``'s
    fused segment-sum kernel (no col2im analog needed for the window path).

    The out-of-envelope correction is tiered by the runtime tap count:
    0 taps -> skipped entirely; <= correction_budget taps -> sparse
    compact+gather (O(budget) rows, ~1 ms); more -> full masked oracle
    (exact for pathological checkpoints, at gather cost)."""
    from codetr_tpu.ops.msda_win import msda_win_qm, win_envelope_mask

    # the kernel masks out-of-envelope taps itself and returns their count —
    # no K-sized mask/where pass in the common (all-in-envelope) case; the
    # correction branches below recompute the mask only when they fire
    # (measured ~25 ms of pure mask/where HBM traffic at 1920x1280 when this
    # ran unconditionally in the wrapper)
    out, n_out = msda_win_qm(
        value, spatial_shapes, x, y, w, radius=radius, interpret=interpret,
        with_count=True,
    )

    def _branch_inputs():
        # optimization_barrier: without it, XLA propagates the gather-heavy
        # correction branches' preferred coordinate layout OUT of the cond
        # and materializes x/y/w as (bs,h,L,P,K) copies with P on the lane
        # axis — 51x tile padding, 6.2 GB each at 1920x1280, executed
        # UNCONDITIONALLY (observed in the HLO allocation dump; cost ~38 ms
        # per call).  The barrier pins the branch-local views inside the
        # cond, so they exist only when a correction actually fires.
        return jax.lax.optimization_barrier((value, x, y, w))

    def sparse(_):
        v2, x2, y2, w2 = _branch_inputs()
        mask = win_envelope_mask(spatial_shapes, x2, y2, radius=radius)
        w_out = jnp.where(mask, 0, w2)
        return _sparse_correction(
            v2, spatial_shapes, x2, y2, w_out, correction_budget
        ).astype(out.dtype)

    def full(_):
        # the worst-case tier: exact for ANY offset distribution at gather
        # cost.  Pitched gather packs all 4 bilinear corners into ONE row
        # per tap — half the rows of pair-gather, a quarter of the flat
        # oracle — so the cliff is ~2x shallower (XLA gather is row-count
        # bound at ~80 M rows/s, ROUND3_NOTES.md).
        v2, x2, y2, w2 = _branch_inputs()
        mask = win_envelope_mask(spatial_shapes, x2, y2, radius=radius)
        w_out = jnp.where(mask, 0, w2)
        return msda_pitched_gather_qm(v2, spatial_shapes, x2, y2, w_out).astype(out.dtype)

    def correction(_):
        return jax.lax.cond(
            n_out <= correction_budget, sparse, full, operand=None
        )

    return out + jax.lax.cond(
        n_out > 0, correction, lambda _: jnp.zeros_like(out), operand=None
    )


def _win_exact_ad_fwd(value, spatial_shapes, x, y, w, radius, interpret,
                      correction_budget=16384):
    out = _win_exact_ad(
        value, spatial_shapes, x, y, w, radius, interpret, correction_budget
    )
    return out, (value, x, y, w)


def _win_exact_ad_bwd(spatial_shapes, radius, interpret, correction_budget, res, g):
    value, x, y, w = res
    _, vjp = jax.vjp(
        lambda v, xx, yy, ww: msda_pair_gather_qm_ad(v, spatial_shapes, xx, yy, ww),
        value, x, y, w,
    )
    return vjp(g)


_win_exact_ad.defvjp(_win_exact_ad_fwd, _win_exact_ad_bwd)


def _win_packed_primal(value, spatial_shapes, cpk, num_points, radius,
                       interpret, correction_budget):
    """Shared primal of the packed windowed path: windowed kernel + tiered
    out-of-envelope correction.  Returns (out, n_out) so the VJP can gate
    the correction gradients on the same runtime count."""
    from codetr_tpu.ops.msda_win import (
        msda_win_qm_packed,
        unpack_coords_qmajor,
        win_envelope_mask,
    )

    L = len(spatial_shapes)
    h = value.shape[2]
    out, n_out = msda_win_qm_packed(
        value, spatial_shapes, cpk, num_points, radius=radius,
        interpret=interpret, with_count=True,
    )

    def _branch_inputs():
        # barrier rationale: _win_exact_ad._branch_inputs
        return jax.lax.optimization_barrier((value, cpk))

    def _unpacked():
        v2, c2 = _branch_inputs()
        x2, y2, w2 = unpack_coords_qmajor(c2, h, L, num_points)
        mask = win_envelope_mask(spatial_shapes, x2, y2, radius=radius)
        return v2, x2, y2, jnp.where(mask, 0, w2)

    def sparse(_):
        v2, x2, y2, w_out = _unpacked()
        return _sparse_correction(
            v2, spatial_shapes, x2, y2, w_out, correction_budget
        ).astype(out.dtype)

    def full(_):
        # pitched gather: see _win_exact_ad.full (1 row/tap — the cheapest
        # exact any-offset tier measured on this chip)
        v2, x2, y2, w_out = _unpacked()
        return msda_pitched_gather_qm(v2, spatial_shapes, x2, y2, w_out).astype(out.dtype)

    def correction(_):
        return jax.lax.cond(
            n_out <= correction_budget, sparse, full, operand=None
        )

    out = out + jax.lax.cond(
        n_out > 0, correction, lambda _: jnp.zeros_like(out), operand=None
    )
    return out, n_out


@partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4, 5, 6))
def _win_exact_ad_packed(value, spatial_shapes, cpk, num_points, radius,
                         interpret, correction_budget=65536):
    """Packed-coordinate twin of ``_win_exact_ad``: the hot path takes the
    q-major packed coordinate tensor straight from the projections (zero
    relayout, see ops/msda_win.py:msda_win_lq_packed); the correction
    branches unpack to q-minor lazily (only when an out-of-envelope tap
    exists at runtime).  The backward is the FUSED WINDOWED kernel
    (ops/msda_win_bwd.py — same window geometry as the forward) plus the
    coarse-level pair-gather VJP and a cond-gated correction VJP, replacing
    round 3's encoder-scale pair-gather backward (130/773 ms per call)."""
    out, _ = _win_packed_primal(
        value, spatial_shapes, cpk, num_points, radius, interpret,
        correction_budget,
    )
    return out


def _win_exact_ad_packed_fwd(value, spatial_shapes, cpk, num_points, radius,
                             interpret, correction_budget=65536):
    out, n_out = _win_packed_primal(
        value, spatial_shapes, cpk, num_points, radius, interpret,
        correction_budget,
    )
    return out, (value, cpk, n_out)


def _win_exact_ad_packed_bwd(spatial_shapes, num_points, radius, interpret,
                             correction_budget, res, g):
    """Tiered backward, mirroring the forward's structure:

    1. fused windowed kernel for the in-envelope taps of windowed levels
       (grad_value via S^T dots + RMW window DMA; coord grads via separable
       hat-derivative reductions) — ops/msda_win_bwd.py;
    2. pair-gather VJP for the coarse (oracle-routed) query levels only
       (a few thousand queries — cheap);
    3. correction VJP for out-of-envelope taps, cond-gated on the runtime
       count exactly like the forward (zero cost when nothing fired):
       the sparse tier differentiates the compact+gather composite via XLA
       AD (O(K) + O(budget)); over budget falls back to the whole-table
       pair VJP."""
    from codetr_tpu.ops.msda_win import (
        _coarse_fallback,
        _tile_shape_for_level,
        unpack_coords_qmajor,
        win_envelope_mask,
    )
    from codetr_tpu.ops.msda_win_bwd import msda_win_qm_packed_bwd

    value, cpk, n_out = res
    bs, K, h, d = value.shape
    L = len(spatial_shapes)
    HLP = h * L * num_points
    C = cpk.shape[-1]
    g = g.reshape(bs, K, h * d)

    # 1. fused windowed backward
    g_value, g_cpk = msda_win_qm_packed_bwd(
        value, spatial_shapes, cpk, g, num_points, radius=radius,
        interpret=interpret,
    )
    g_value = g_value.astype(jnp.float32)

    def _pack_qm_grads(g_x, g_y, g_w, q0, Kq):
        """(bs,h,L,P,Kq) q-minor grads -> rows of a (bs,K,C) packed grad."""
        part = jnp.concatenate(
            [a.astype(jnp.float32).reshape(bs, HLP, Kq) for a in (g_x, g_y, g_w)],
            axis=1,
        ).transpose(0, 2, 1)
        if C != 3 * HLP:
            part = jnp.pad(part, ((0, 0), (0, 0), (0, C - 3 * HLP)))
        return jnp.zeros((bs, K, C), jnp.float32).at[:, q0:q0 + Kq].set(part)

    # 2. coarse-level queries (their forward is the pair/pitched gather)
    lvl_start = np.concatenate(
        [[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])]
    )
    x, y, w = unpack_coords_qmajor(cpk, h, L, num_points)
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        th, tw = _tile_shape_for_level(lq, L)
        if th * tw >= 16:
            continue
        q0, Kq = int(lvl_start[lq]), Hq * Wq
        xl = jax.lax.slice_in_dim(x, q0, q0 + Kq, axis=4)
        yl = jax.lax.slice_in_dim(y, q0, q0 + Kq, axis=4)
        wl = jax.lax.slice_in_dim(w, q0, q0 + Kq, axis=4)
        gl = jax.lax.slice_in_dim(g, q0, q0 + Kq, axis=1)
        _, vjp_c = jax.vjp(
            lambda v, a, b, c_: _coarse_fallback(v, spatial_shapes, a, b, c_),
            value, xl, yl, wl,
        )
        gv_c, gx_c, gy_c, gw_c = vjp_c(gl.astype(value.dtype))
        g_value = g_value + gv_c.astype(jnp.float32)
        g_cpk = g_cpk + _pack_qm_grads(gx_c, gy_c, gw_c, q0, Kq)

    # 3. out-of-envelope correction gradients (cond-gated like the forward)
    def corr_vjp(_):
        v2, c2 = jax.lax.optimization_barrier((value, cpk))
        x2, y2, w2 = unpack_coords_qmajor(c2, h, L, num_points)
        mask = win_envelope_mask(spatial_shapes, x2, y2, radius=radius)

        def sparse_fn(v, a, b, ww):
            return _sparse_correction(
                v, spatial_shapes, a, b, jnp.where(mask, 0, ww),
                correction_budget,
            )

        def pair_fn(v, a, b, ww):
            # q_chunk=1024: XLA statically allocates this branch's AD
            # buffers even when the branch never executes — at the default
            # 8192 chunk the jvp materializes four (4,bs,h,L,P,qc,d) f32
            # temporaries that pad 4x on the d=32 lane axis (4 x 2.5 GB at
            # 608-encoder shapes, observed OOMing the train step at 19.4 GB
            # HBM).  1024 bounds the dead reservation to ~320 MB; the tier
            # only runs for pathological over-budget checkpoints anyway.
            return msda_pair_gather_qm(
                v, spatial_shapes, a, b, jnp.where(mask, 0, ww), q_chunk=1024
            )

        def run(fn):
            _, vv = jax.vjp(fn, v2, x2, y2, w2)
            return vv(g.astype(jnp.float32))

        def run_sparse(_):
            return run(sparse_fn)

        def run_pair(_):
            gv, gx, gy, gw = run(
                lambda v, a, b, ww: pair_fn(v, a, b, ww).astype(jnp.float32)
            )
            return gv, gx, gy, gw

        gv, gx, gy, gw = jax.lax.cond(
            n_out <= correction_budget, run_sparse, run_pair, operand=None
        )
        return gv.astype(jnp.float32), _pack_qm_grads(gx, gy, gw, 0, K)

    def no_corr(_):
        return (
            jnp.zeros_like(g_value),
            jnp.zeros((bs, K, C), jnp.float32),
        )

    gv_corr, gc_corr = jax.lax.cond(n_out > 0, corr_vjp, no_corr, operand=None)
    g_value = g_value + gv_corr
    g_cpk = g_cpk + gc_corr
    return g_value.astype(value.dtype), g_cpk.astype(cpk.dtype)


_win_exact_ad_packed.defvjp(_win_exact_ad_packed_fwd, _win_exact_ad_packed_bwd)


def msda_grid_packed(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    cpk: jax.Array,  # (bs, K, C) packed q-major [x(HLP) | y(HLP) | w(HLP) | pad]
    num_points: int,
    *,
    impl: str = "auto",
    radius: int = 4,
    correction_budget: int = 65536,
) -> jax.Array:
    """Grid-query MSDA on PACKED q-major coordinates — the production
    encoder entry (exact for arbitrary offsets via the envelope-split
    correction, fused pair-table backward).  ``impl="reference"`` unpacks
    and runs the flat-gather oracle (tests / CPU).  Size ``radius`` /
    ``correction_budget`` for a trained checkpoint with
    ops/msda_calibrate.suggest_correction."""
    if impl == "reference":
        from codetr_tpu.ops.msda_win import unpack_coords_qmajor

        h = value.shape[2]
        x, y, w = unpack_coords_qmajor(cpk, h, len(spatial_shapes), num_points)
        return msda_reference_qm(value, spatial_shapes, x, y, w)
    assert impl in ("auto", "win"), impl
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    return _win_exact_ad_packed(
        value, spatial_shapes, cpk, num_points, radius, interpret,
        correction_budget,
    )


def msda_grid_qm(
    value: jax.Array,
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) normalized x in [0,1]
    y: jax.Array,  # (bs, h, L, P, K)
    w: jax.Array,  # (bs, h, L, P, K) softmaxed weights
    *,
    impl: str = "auto",
    radius: int = 4,
    envelope: str = "correct",
    correction_budget: int = 65536,
) -> jax.Array:
    """Grid-query MSDA on q-minor coordinates, exact for ARBITRARY offsets.

    The shift-window paths (ops/msda_grid.py, ops/msda_pallas.py) are exact
    only for taps within their per-pair window envelope; trained checkpoints
    produce unbounded learned offsets.  With ``envelope="correct"`` (the
    default) taps outside the envelope are split off by weight masking and
    routed through the flat-gather oracle inside a ``lax.cond`` — zero cost
    when every tap is in-envelope (the predicate is False and the branch is
    skipped at runtime), exact when not.  ``envelope="unchecked"`` skips the
    guard (benchmarking only — silent truncation outside the envelope).
    """
    if impl == "auto":
        # RAW-measured round 3 (ROUND3_NOTES.md): the round-2 ratio-derived
        # "3.9 ms" for pair-gather at encoder scale was a calibration
        # artifact — XLA gather runs ~75-85M rows/s FLAT, i.e. 130 ms at
        # 608x608 and 773 ms at 1920x1280 per encoder call.  The windowed
        # splat-matmul kernel (ops/msda_win.py) measured 11.9 ms / 55.6 ms
        # raw in canary-sane windows for the same calls (still ~2x-dilated
        # chip), exact within its envelope with the arbitrary-offset
        # correction + fused pair-table backward carried by _win_exact_ad.
        # Non-TPU (CPU tests): interpret-mode Pallas is slow at scale, but
        # auto-on-grid is only reached through model code, whose CPU tests
        # use tiny shapes.
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        return _win_exact_ad(value, spatial_shapes, x, y, w, radius, interpret,
                             correction_budget)
    from codetr_tpu.ops.msda_grid import envelope_mask, msda_grid_shift_qm
    from codetr_tpu.ops.msda_pallas import msda_grid_pallas_qm
    from codetr_tpu.ops.msda_win import msda_win_qm, win_envelope_mask

    if impl == "win":
        # round-3 production encoder kernel: windowed splat-matmul
        # (ops/msda_win.py) — replaces the whole-table gathers (75-85M
        # rows/s flat -> 130 ms/call at 608, ROUND3_NOTES.md) with per-tile
        # MXU dots against DMA'd window slabs.
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        if envelope == "correct":
            # custom_vjp composite: exact forward + fused pair-table backward
            return _win_exact_ad(value, spatial_shapes, x, y, w, radius, interpret,
                             correction_budget)
        grid_fn = partial(msda_win_qm, radius=radius, interpret=interpret)
        mask_fn = partial(win_envelope_mask, radius=radius)
    elif impl == "grid":
        grid_fn = partial(msda_grid_shift_qm, radius=radius)
        mask_fn = partial(envelope_mask, radius=radius, max_window=None)
    elif impl == "grid_pallas":
        grid_fn = partial(msda_grid_pallas_qm, radius=radius)
        mask_fn = partial(envelope_mask, radius=radius, max_window=31)
    else:
        raise ValueError(f"unknown grid impl {impl!r}")

    if envelope == "unchecked":
        return grid_fn(value, spatial_shapes, x, y, w)
    assert envelope == "correct", envelope

    mask = mask_fn(spatial_shapes, x, y)
    w_in = jnp.where(mask, w, 0)
    out = grid_fn(value, spatial_shapes, x, y, w_in)

    def correction(_):
        w_out = jnp.where(mask, 0, w)
        return msda_reference_qm(value, spatial_shapes, x, y, w_out)

    any_out = ~jnp.all(mask)
    out = out + jax.lax.cond(
        any_out, correction, lambda _: jnp.zeros_like(out), operand=None
    )
    return out


def multi_scale_deformable_attention(
    value: jax.Array,
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    *,
    impl: str = "auto",
    grid_queries: bool = False,
    grid_radius: int = 4,
    envelope: str = "correct",
) -> jax.Array:
    """Dispatching entry point (the analog of the reference's CUDA-vs-CPU
    dispatch at codetr/multi_scale_deformable_attention.py:203-210).

    impl:
      - "reference": exact flat-gather everywhere.
      - "grid": XLA shift-window path (requires grid_queries=True).
      - "grid_pallas": fused Pallas shift-window kernel (grid queries, TPU).
      - "auto": Pallas shift-window for grid queries on TPU, XLA shift-window
        for grid queries elsewhere, exact gather for non-grid queries.
    grid_queries: queries are the level-concatenated pixel grid (encoder
      self-attention) — enables the gather-free paths.  Grid paths carry the
      out-of-envelope exact correction (see msda_grid_qm) unless
      envelope="unchecked".
    """
    if impl == "auto" and not grid_queries:
        # small query counts (decoder): pair-gather (measured 3.3 ms at 900
        # queries — the quad variant's five per-level gathers pay more fixed
        # overhead than they save in rows)
        if sampling_locations.shape[1] <= 4096:
            return msda_pair_gather(
                value, spatial_shapes, sampling_locations, attention_weights
            )
        return multi_scale_deformable_attention_reference(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "reference":
        return multi_scale_deformable_attention_reference(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    assert grid_queries, f"impl={impl!r} requires grid queries"
    loc = sampling_locations.transpose(0, 2, 3, 4, 5, 1)  # (bs,h,L,P,2,K)
    attw = attention_weights.transpose(0, 2, 3, 4, 1)
    return msda_grid_qm(
        value,
        spatial_shapes,
        loc[..., 0, :],
        loc[..., 1, :],
        attw,
        impl=impl,
        radius=grid_radius,
        envelope=envelope,
    )
