"""Grid-query multi-scale deformable attention via shift-window decomposition.

TPU-native reformulation of the encoder's MSDA self-attention.  The encoder's
queries ARE the multi-level pixel grid (reference: get_reference_points,
transformer.py:280-305, consumed by MultiScaleDeformableAttention at
multi_scale_deformable_attention.py:186-191), so each sampling location is a
*static per-query anchor* (the query's own position mapped into the target
level) plus a bounded data-dependent jitter (learned offset + valid-ratio
drift).  Deformable sampling then becomes dynamic local filtering:

    out[q] = sum_{(dy,dx) in window} m[q, dy, dx] * V_t[anchor(q) + (dy, dx)]

with m the bilinear splat of the P sampling points into the window.  This
needs NO data-dependent gather — only static strided slices of the (padded,
possibly nearest-upsampled) target level plus vectorized FMAs.  Scattered
reads are the one thing a TPU cannot do fast (no L2 to absorb them like the
CUDA kernel's ms_deform_attn.cu:211-261; XLA's gather runs at ~200M rows/s,
~100x short of the tap rate this model needs), while static shifts + FMA run
at full VPU rate.

Exactness contract: identical (fp32) to the exact reference implementation
for every sampling point within ``radius`` pixels (target-level units) of its
query anchor; farther points contribute zero.  The reference's grid-pattern
offset init keeps |offset| <= num_points = 4
(multi_scale_deformable_attention.py:101-111), so the default radius covers
the init envelope; valid-ratio drift between levels is covered by a per-pair
margin (2^max(0, lq-lt), from |vr_a - vr_b| <= 1/min(W_a, W_b)).
``multi_scale_deformable_attention_reference`` remains the any-offset oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Shapes = Tuple[Tuple[int, int], ...]


def _ideal_scale(nq: int, nt: int) -> int:
    """Signed power-of-2 scale between pyramid axes: +k if the target is
    ~2^k finer, -k if ~2^k coarser.  Pyramid sizes follow repeated
    ceil-division by 2, so |true position - ideal anchor| < 2^max(0,-k)
    (see module doc) — absorbed by pair_margin."""
    import math

    return round(math.log2(nt / nq)) if nt != nq else 0


def _anchor(i: np.ndarray, nq: int, nt: int, k: int | None = None) -> np.ndarray:
    """Idealized anchor map floor((i+0.5)*2^k - 0.5) for the power-of-2
    scale k between the axes (exact when nt/nq is a power of 2)."""
    if k is None:
        k = _ideal_scale(nq, nt)
    scale = 2.0**k
    return np.floor((i + 0.5) * scale - 0.5).astype(np.int64)


def pair_margin(lq: int, lt: int) -> int:
    """Window slack beyond ``radius``: 0 same-level, 2 cross-level.

    Cross-level slack covers the idealized-anchor snap (<= 1 for power-of-2
    level ratios — exact on every real pyramid except pairs touching a
    ceil-division tail like 19->10, where the drift stays < 1 px) plus the
    valid-ratio drift (<= ~1 px, |vr_a - vr_b| <= 1/min level dim).  Taps
    that exceed the window under extreme padding are NOT lost: the
    dispatcher's envelope mask routes them through the exact flat-gather
    oracle (ops/msda.py msda_grid_qm), so a small margin trades a rare
    correction pass for a 1.6-3.2x smaller window sweep on every call (the
    old worst case was 2^(lq-lt+1) slack -> W=27 windows)."""
    return 0 if lq == lt else 2


class _AxisPlan:
    """Per-axis slice plan: U[sigma_i * i + sigma_d * dy + s0] == padded-target
    row (anchor(i) + dy - R - 1), for i in [0, nq), dy in [0, 2R+3).

    U is the zero-padded target axis, nearest-upsampled (repeated) when the
    target is coarser than the query grid.  Verified numerically on
    construction.
    """

    def __init__(self, nq: int, nt: int, R: int, k: int | None = None):
        # k: explicit power-of-2 scale (needed when nq was padded for tiling
        # and the rounded log2 would misclassify the pair)
        self.nq, self.nt, self.R = nq, nt, R
        self.W = 2 * R + 3
        if k is None:
            k = _ideal_scale(nq, nt)
        i = np.arange(nq)
        ay = _anchor(i, nq, nt, k)  # target row for window offset R+1 ("center")
        if k >= 0:
            f = 1 << k
            self.repeat = 1
            self.sigma_i, self.sigma_d = f, 1
            base = ay - f * i  # constant for the idealized map
            assert np.all(base == base[0]), (nq, nt, base[:4])
            s = int(base[0]) - (R + 1)
        else:
            g = 1 << (-k)
            self.repeat = g
            self.sigma_i, self.sigma_d = 1, g
            # U[m] = target[(m - pad*g) // g]; need (i + g*dy + s)//g == ay + dy
            s = -(g // 2)
            assert np.all((i + s) // g == ay), (nq, nt, k)
            s = s - (R + 1) * g
        # shift into padded coordinates: pad the target axis with `pad` zeros
        # on each side (in target units) so all indices are in range.
        lo = self.sigma_i * 0 + self.sigma_d * 0 + s
        hi = self.sigma_i * (nq - 1) + self.sigma_d * (self.W - 1) + s
        # in target units the accessed range is [lo/repeat, hi/repeat]
        self.pad = max(R + 2, -lo if self.repeat == 1 else -(lo // self.repeat) + 1, 0)
        if self.repeat == 1:
            self.s0 = s + self.pad
            needed = hi + self.pad + 1
            self.ulen = max(needed, nt + 2 * self.pad)
        else:
            self.s0 = s + self.pad * self.repeat
            needed = hi + self.pad * self.repeat + 1
            self.ulen = max(needed, (nt + 2 * self.pad) * self.repeat)
        # numeric verification of the contract on the padded array
        uidx = lambda ii, dy: self.sigma_i * ii + self.sigma_d * dy + self.s0
        tgt = lambda k: k // self.repeat - self.pad  # target row of U[k]
        for dy in (0, 1, self.W - 1):
            got = tgt(uidx(i, dy))
            want = ay + dy - (R + 1)
            assert np.array_equal(got, want), (nq, nt, dy)

    def build(self, v: jax.Array, axis: int) -> jax.Array:
        """Pad + repeat the target axis into U coordinates."""
        pad_widths = [(0, 0)] * v.ndim
        pad_widths[axis] = (self.pad, self.pad)
        u = jnp.pad(v, pad_widths)
        if self.repeat > 1:
            u = jnp.repeat(u, self.repeat, axis=axis)
        extra = self.ulen - u.shape[axis]
        if extra > 0:
            pw = [(0, 0)] * v.ndim
            pw[axis] = (0, extra)
            u = jnp.pad(u, pw)
        return u


def envelope_mask(
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) normalized x
    y: jax.Array,  # (bs, h, L, P, K) normalized y
    *,
    radius: int = 4,
    max_window: int | None = None,
) -> jax.Array:
    """True where a tap lies inside the shift-window sweep's exactness domain
    for its (query level, target level) pair.

    Taps with mask False contribute ZERO in the swept paths (their hats fall
    outside the window) — the dispatcher (ops/msda.py msda_grid_qm) routes
    exactly those taps through the flat-gather oracle so the combined result
    is exact for arbitrary learned offsets (trained checkpoints have
    unbounded offsets; the offsets head is a plain Linear,
    multi_scale_deformable_attention.py:97-115 covers only the init).

    ``max_window``: mirror of the Pallas kernel's coarse-pair escape — pairs
    whose idealized window exceeds it use TRUE rational anchors and the
    drift-only margin (msda_pallas._coarse_pair_xla).
    """
    L = len(spatial_shapes)
    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])
    parts = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        Kq = Hq * Wq
        q0 = int(lvl_start[lq])
        xq = jax.lax.slice_in_dim(x, q0, q0 + Kq, axis=4).astype(jnp.float32)
        yq = jax.lax.slice_in_dim(y, q0, q0 + Kq, axis=4).astype(jnp.float32)
        lvl_masks = []
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            R = radius + pair_margin(lq, lt)
            if max_window is not None and 2 * R + 3 > max_window:
                # coarse-pair XLA path: true anchors, drift-only margin
                R = radius + 2
                ay = np.floor((np.arange(Hq) + 0.5) * (Ht / Hq) - 0.5)
                ax = np.floor((np.arange(Wq) + 0.5) * (Wt / Wq) - 0.5)
            else:
                ay = _anchor(np.arange(Hq), Hq, Ht).astype(np.float64)
                ax = _anchor(np.arange(Wq), Wq, Wt).astype(np.float64)
            W_POS = 2 * R + 3
            ay = jnp.asarray(np.repeat(ay, Wq), jnp.float32)
            ax = jnp.asarray(np.tile(ax, Hq), jnp.float32)
            tx = xq[:, :, lt] * Wt - 0.5 - ax + (R + 1.0)  # (bs, h, P, Kq)
            ty = yq[:, :, lt] * Ht - 0.5 - ay + (R + 1.0)
            ok = (tx >= 0) & (tx <= W_POS - 1) & (ty >= 0) & (ty <= W_POS - 1)
            lvl_masks.append(ok)
        parts.append(jnp.stack(lvl_masks, axis=2))  # (bs, h, L, P, Kq)
    return jnp.concatenate(parts, axis=4)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "radius"))
def msda_grid_shift_qm(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) normalized x in [0,1]
    y: jax.Array,  # (bs, h, L, P, K)
    w: jax.Array,  # (bs, h, L, P, K)
    *,
    radius: int = 4,
) -> jax.Array:
    bs, K, h, d = value.shape
    P = x.shape[3]
    assert x.shape[-1] == K, "grid MSDA requires queries == the key grid"
    f32 = jnp.float32

    # TPU layout note: all big arrays keep the query grid (Hq, Wq) as the two
    # minor dims (lanes/sublanes); small dims (P, window) stay major — tiny
    # trailing dims would be tile-padded to (8, 128) with up to 50x waste.
    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])
    out_chunks = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        Kq = Hq * Wq
        q0 = int(lvl_start[lq])
        xq = jax.lax.slice_in_dim(x, q0, q0 + Kq, axis=4)  # (bs, h, L, P, Kq)
        yq = jax.lax.slice_in_dim(y, q0, q0 + Kq, axis=4)
        wq = jax.lax.slice_in_dim(w, q0, q0 + Kq, axis=4)

        acc = jnp.zeros((bs, h, d, Hq, Wq), f32)
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            R = radius + pair_margin(lq, lt)
            py = _AxisPlan(Hq, Ht, R)
            px = _AxisPlan(Wq, Wt, R)
            W_POS = py.W

            t0 = int(lvl_start[lt])
            v_t = jax.lax.slice_in_dim(value, t0, t0 + Ht * Wt, axis=1)
            # (bs, h, d, Ht, Wt)
            v_t = v_t.reshape(bs, Ht, Wt, h, d).transpose(0, 3, 4, 1, 2)
            U = py.build(v_t, axis=3)
            U = px.build(U, axis=4)

            anch_y = jnp.asarray(_anchor(np.arange(Hq), Hq, Ht), f32)
            anch_x = jnp.asarray(_anchor(np.arange(Wq), Wq, Wt), f32)
            anch_y = jnp.broadcast_to(anch_y[:, None], (Hq, Wq)).reshape(-1)
            anch_x = jnp.broadcast_to(anch_x[None, :], (Hq, Wq)).reshape(-1)

            pos_x = xq[:, :, lt].astype(f32) * Wt - 0.5  # (bs, h, P, Kq)
            pos_y = yq[:, :, lt].astype(f32) * Ht - 0.5
            tx = pos_x - anch_x + (R + 1.0)  # window coords in [0, W_POS)
            ty = pos_y - anch_y + (R + 1.0)
            ww = wq[:, :, lt].astype(f32)  # (bs, h, P, Kq)

            for dy in range(W_POS):
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(ty - dy)) * ww  # (bs,h,P,Kq)
                ys = py.sigma_d * dy + py.s0
                row = jax.lax.slice(
                    U,
                    (0, 0, 0, ys, 0),
                    (bs, h, d, ys + py.sigma_i * (Hq - 1) + 1, U.shape[4]),
                    (1, 1, 1, py.sigma_i, 1),
                )  # (bs, h, d, Hq, Ux)
                for dx in range(W_POS):
                    # m for this (dy, dx): bilinear splat over the P points
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(tx - dx))
                    m = jnp.sum(hy * hx, axis=2).reshape(bs, h, 1, Hq, Wq)
                    xs = px.sigma_d * dx + px.s0
                    a = jax.lax.slice(
                        row,
                        (0, 0, 0, 0, xs),
                        (bs, h, d, Hq, xs + px.sigma_i * (Wq - 1) + 1),
                        (1, 1, 1, 1, px.sigma_i),
                    )  # (bs, h, d, Hq, Wq)
                    acc = acc + m * a.astype(f32)
        # (bs, h, d, Hq, Wq) -> (bs, Kq, h, d)
        acc = acc.transpose(0, 3, 4, 1, 2).reshape(bs, Kq, h, d)
        out_chunks.append(acc)

    out = jnp.concatenate(out_chunks, axis=1)
    return out.astype(value.dtype).reshape(bs, K, h * d)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "radius"))
def msda_grid_shift(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,  # (bs, Q=K, h, L, P, 2) in [0,1]
    attention_weights: jax.Array,  # (bs, Q=K, h, L, P)
    *,
    radius: int = 4,
) -> jax.Array:
    """Reference-layout wrapper over the q-minor core."""
    assert sampling_locations.shape[1] == value.shape[1]
    loc = sampling_locations.transpose(0, 2, 3, 4, 5, 1)  # (bs,h,L,P,2,K)
    attw = attention_weights.transpose(0, 2, 3, 4, 1)
    return msda_grid_shift_qm(
        value, spatial_shapes, loc[..., 0, :], loc[..., 1, :], attw, radius=radius
    )
