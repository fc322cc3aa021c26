"""Windowed splat-matmul MSDA — the round-3 production encoder kernel.

Round-3 RAW measurements (ROUND3_NOTES.md) overturned the gather premise:
XLA row-gather runs at ~75-85M rows/s at EVERY scale on this chip, so one
encoder-scale pair-gather call costs 130 ms at 608x608 and 773 ms at
1920x1280 — unshippable.  (The reference's CUDA kernel
`ms_deform_attn.cu:211-261` leans on the GPU's L2 to serve exactly this
scattered-read pattern; a TPU has no such path.)

This kernel exploits the encoder's structure instead: queries ARE the pixel
grid, so a tile of queries samples each value level inside a bounded window
around the tile's geometric projection.  Per (batch*head, query-tile):

1. DMA the window slab of each value level HBM -> VMEM (async copies all
   started up front; window start computed from the tile index,
   statically-shaped per (lq, lt) pair).
2. Build the tile's splat matrix S (queries x window-cells) on the VPU
   while the copies fly: for each of the L*P taps, the separable bilinear
   hat  max(0, 1-|cell_x - x|) * max(0, w - w*|cell_y - y|)  over the
   flattened window-cell iota (cell_y = c // WinW, cell_x = c % WinW,
   both loop-invariant).  This one expression covers all four bilinear
   corners AND reproduces grid_sample's zeros padding at the clamped
   window edges; the attention weight w is folded into the y factor.
   No gather, no scatter, no per-cell scalar work.
3. One MXU dot per target level: S (NQ x cells) @ slab (cells x d),
   accumulated in fp32 across levels.

Cost model @608 per encoder layer: ~45 GFLOP of splat dots (~1 ms at the
measured 45 TFLOP ceiling) + ~10 full-width VPU ops per tap on (NQ, cells)
tiles (~3-5 ms) + ~1.5x slab DMA traffic — vs 130 ms for the gather path.
Exactness: identical bilinear/zeros semantics for every tap whose in-level
bilinear corners fall inside its tile's window (guaranteed for offsets up
to ``radius-1`` px; ``win_envelope_mask`` gives the exact per-tap domain);
arbitrary offsets are handled by the caller's envelope weight-split with
the exact-gather correction (ops/msda.py:msda_grid_qm), unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Shapes = Tuple[Tuple[int, int], ...]

# attribution-only knob (see ROUND3_NOTES.md): "nodot" drops the MXU dots,
# "nosplat" replaces the per-tap splat build with one shared hat per
# (head, level), "minimal" does both — the deltas isolate splat-build vs
# dot vs DMA cost.  Read once at import; never set in production.
import os as _os

_DEBUG_STAGE = _os.environ.get("MSDA_WIN_DEBUG", "")
# coarse-query-level exact fallback: "pitched" (1 gather row/tap, real
# corner-table build) | "pair" (2 rows/tap, cheap 2-roll table) |
# "reference" (4 rows/tap, free view table) — A/B knob; see ROUND4_NOTES.md
_COARSE_IMPL = _os.environ.get("MSDA_WIN_COARSE", "pair")
# coarse-query-level ROUTING (round-5): "win" sends lq3/lq4 through the
# windowed kernel with row-tiles (NQ 32/16 — lane-padded, but the whole
# level is <2% of queries while its pair gather measured 19+6 ms @1920 vs
# ~4+4 windowed); "gather" restores the round-4 fallback tiles.  The same
# tile decision drives the forward dispatch, win_envelope_mask, and the
# fused backward (all route on th*tw >= 16).
_COARSE_TILES = _os.environ.get("MSDA_WIN_COARSE_TILES", "win")
# "auto" (default): splat planes in the value dtype; "f32": force the
# round-3 f32 splat build (A/B attribution only)
_SPLAT_DTYPE = _os.environ.get("MSDA_WIN_SPLAT", "auto")
# max bytes per (chunk, WinW, NQ) f32 splat plane before the expansion is
# chunked on the window's y axis (see _splat_tile)
_CHUNK_BYTES = int(_os.environ.get("MSDA_WIN_CHUNK_BYTES", str(1280 * 1024)))
# Mosaic scoped-vmem limit for the kernel compiles.  XLA's default scoped
# limit is 16 MB — that limit (not physical VMEM, 128 MB on v5e) is what
# sized the round-3/4 tile shapes and OOM'd the f32 path at 608 by 92 KB.
# Raising it trades double-buffer headroom for bigger live sets; 64 MB
# compiles every production geometry with room to spare.
_VMEM_LIMIT = int(_os.environ.get("MSDA_WIN_VMEM_MB", "64")) * 2**20


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _tile_shape_for_level(lq: int, num_levels: int) -> Tuple[int, int]:
    """Query-tile extent (rows, cols) at query level lq.

    The finest level uses 16x16 (256 queries/tile, full MXU rows); coarser
    query levels shrink the tile because a tile's window onto the finest
    TARGET level scales with 2^lq per axis, and the kernel's peak VMEM live
    set (S + hats + the hoisted per-level cell iotas, each NQ x cells f32)
    must stay well under the 16 MB scoped-vmem limit.  These shapes keep
    the worst (lq, lt) pair's cells*NQ product <= ~266K (~1 MB per f32
    temporary).  (16,16) at lq=0 measured 15.06 ms for the 608 encoder call
    but overflowed scoped vmem by 1.1 MB at 1920x1280; (8,16) halves the
    peak (cells 1040 -> 720, NQ 256 -> 128)."""
    if lq == 0:
        # NQ = 256 = two full lane tiles: the separable splat build keeps
        # queries on the LANE axis (full utilization), and the larger tile
        # amortizes the window halo — slab DMA per query drops from ~5.6
        # cells (8x16 tiles) to ~4.1 (16x16).  Mosaic's scoped-vmem live
        # set is ~10x the S3 plane (per-tap broadcast temporaries), which
        # caps this at lq=0: (16,16) at lq=1 measured 25.9 MB (limit 16).
        return (16, 16)
    if lq == 1:
        return (8, 16)
    if lq == 2:
        # (8,16): full 128-lane tiles.  The round-3 (4,8) tile's NQ=32
        # planes were lane-padded 4x by Mosaic (measured 10.5 ms @1920 —
        # as much as all of lq1 for <5% of the queries).  The big windows
        # (44x88 onto the stride-4 level) blow Mosaic's scoped-vmem stack
        # when each full (WinH, WinW, NQ) S3 plane lives as one SSA value
        # (29.3 MB measured), so _splat_tile chunks the expansion on the
        # window's y axis (_CHUNK_BYTES), bounding the live set.
        return (8, 16)
    if _COARSE_TILES == "gather":
        # round-4 fallback routing: <16-query tiles mark the level for the
        # exact whole-table gather (_coarse_fallback)
        return (4, 2) if lq == 3 else (2, 2)
    # round-5: windowed row-tiles.  NQ (64 / 32) lane-pads 2-4x in the splat
    # planes, but the level's window cells are small (the tile spans few
    # query px) and the alternative is the 75-85M rows/s gather ceiling:
    # pair-gather measured 19.0 (lq3) + 11.7 (lq4) ms standalone @1920x1280
    # vs 6.5 + 6.3 windowed (canary ~6.3-7, round-5 session 2; the
    # (4,8)/(2,8) tile variant measured the same within noise — the bigger
    # tiles halve the lane waste but double the window rows).
    if lq == 3:
        return (8, 8)
    return (4, 8)


def _rup8(n: int) -> int:
    return -(-n // 8) * 8


def _win_geometry(
    lq: int, spatial_shapes: Shapes, radius: int
) -> Tuple[Tuple[int, int], Tuple[Tuple[int, int], ...]]:
    """((tile_h, tile_w), per-target-level (WinH, WinW)) for query level lq.

    Mosaic alignment: the value's W axis is the sublane dim, so W-window
    slices must have 8-aligned start and extent.  The x start is floored to
    a multiple of 8; the alignment loss is a STATIC per-tile quantity, so
    WinW is padded by the exact maximum loss over the tile row (round-5
    attack B) instead of the worst-case 7 — on 8-aligned projections
    (e.g. lq0 onto the two finest levels) the loss is a constant 3, which
    shrinks the hottest windows 40->32 and 32->24 of x extent.  The
    level's W itself is zero-padded to a multiple of 8 by the wrapper
    (padded cells read zeros == grid_sample's zeros padding, so exactness
    is unaffected).  The H axis is untiled — WinH and wy0 stay free."""
    Hq, Wq = spatial_shapes[lq]
    th, tw = _tile_shape_for_level(lq, len(spatial_shapes))
    ntx = -(-Wq // tw)
    win = []
    for Ht, Wt in spatial_shapes:
        # a tile spans th query px -> ~th * Ht/Hq target px (ceil for
        # off-by-rounding pyramid tails)
        span_y = -(-th * Ht // Hq)
        span_x = -(-tw * Wt // Wq)
        # exact max floor-to-8 loss of the unclamped x start over all tile
        # indices (same integer formula as _win_start_x; clamped windows
        # only ever cover MORE of the needed range and raise edge flags)
        maxloss = 0
        for tx in range(ntx):
            s_un = (tx * tw * Wt) // Wq - radius
            maxloss = max(maxloss, s_un - (s_un // 8) * 8)
        win_h = int(min(Ht, span_y + 2 * radius + 2))
        win_w = int(min(_rup8(Wt), _rup8(span_x + 2 * radius + 2 + maxloss)))
        win.append((win_h, win_w))
    return (th, tw), tuple(win)


def _win_start_y(t, tile: int, nq: int, nt: int, radius: int, wsz: int):
    """Y-window start for tile index t (static or traced): tile origin
    projected onto the target level, minus the radius, clamped so the
    static-size window stays inside the level."""
    return jnp.clip((t * tile * nt) // nq - radius, 0, nt - wsz)


def _win_start_x(t, tile: int, nq: int, nt: int, radius: int, wsz: int):
    """X-window start: as _win_start_y but floored to a multiple of 8 and
    clamped within the 8-padded level width (Mosaic sublane alignment).
    ``pl.multiple_of`` carries the divisibility proof through the clip for
    Mosaic's memref-slice checker."""
    s = ((t * tile * nt) // nq - radius) // 8 * 8
    return pl.multiple_of(jnp.clip(s, 0, _rup8(nt) - wsz), 8)


def _start_window_copies(v_refs, slabs, sems, b, ty, tx, *, th, tw, Hq, Wq,
                         spatial_shapes, win, radius):
    """Kick off every target level's window DMA for tile (ty, tx); splat
    construction overlaps the remaining copies."""
    copies = []
    starts = []
    for lt, (Ht, Wt) in enumerate(spatial_shapes):
        WinH, WinW = win[lt]
        wy0 = _win_start_y(ty, th, Hq, Ht, radius, WinH)
        wx0 = _win_start_x(tx, tw, Wq, Wt, radius, WinW)
        cop = pltpu.make_async_copy(
            v_refs[lt].at[b, pl.ds(wy0, WinH), pl.ds(wx0, WinW), :],
            slabs[lt],
            sems.at[lt],
        )
        cop.start()
        copies.append(cop)
        starts.append((wy0, wx0))
    return copies, starts


def _splat_tile(xb, yb, wb, slabs, copies, starts, *, spatial_shapes, win,
                h, d, P, L, NQ, HD, vdtype, dot_mode):
    """The shared per-tile splat-matmul body: builds per-head splat matrices
    from the (HLP, NQ) coordinate planes and dots them against the DMA'd
    window slabs.  Returns ``(out (NQ, HD) f32, cnt (1, NQ) f32)``.

    dot_mode "dq": out^T = (cells, d) x (cells, NQ) contraction -> (d, NQ).
    The MXU pads the OUTPUT lane dim to 128, so the "qd" form's (NQ, d=32)
    result wastes 4x the lanes; putting NQ (>= 128 for the hot levels) on
    the lanes makes every dot full-width.  The (d, NQ) accumulators are
    transposed back once per tile at the end.

    dot_mode "dh4" (round-5 attack C): the round-4 "dotfull" A/B showed the
    per-head 32-of-256 lane slice dominates the dot stage (a full-slab dot
    at 8x the MACs was FASTER than the sliced dq dots).  dh4 dots each
    head's S3 against the head's 128-lane-ALIGNED group slice of the slab
    (4 heads at d=32) — a free lane-tile slice, 4x the MACs of dq, half of
    dotfull's — and extracts the head's d rows by a free sublane slice.

    Splat precision: the hats are evaluated in f32 on the SMALL separable
    planes (coordinates up to ~hundreds of cells would lose their fraction
    in bf16), then cast to the VALUE dtype for the expansion into the
    (WinH, WinW, NQ) planes — the round-3 kernel cast S to vdtype right
    before the dot anyway, so a bf16 model sees the same rounding class
    (one bf16 ULP on S entries in [0,1]) while the dominant full-plane
    Splat planes stay f32: the round-4 A/B at the @1920 lq0 geometry
    measured the bf16 expansion 1.5x SLOWER (29.1 vs 19.4 ms/call) — v5e
    Mosaic converts bf16 elementwise through f32 per op instead of packing,
    so bf16 only added conversions (and Mosaic cannot shape-cast
    sub-lane-tile bf16 vectors at all: "infer-vector-layout: unsupported
    shape cast" on (28,32)bf16 -> (28,1,32) at NQ=32).  MSDA_WIN_SPLAT=bf16
    re-enables the experiment on full-lane tiles."""
    if _SPLAT_DTYPE == "bf16":  # attribution-only A/B knob
        sdt = vdtype if (vdtype == jnp.bfloat16 and NQ % 128 == 0) else jnp.float32
    else:
        sdt = jnp.float32
    # MXU dot precision: DEFAULT on TPU runs ONE bf16 pass even for f32
    # operands — fine for bf16 models (operands are exact bf16), but the
    # f32 path (gradchecks, impl-parity gates on chip) then deviates from
    # the oracle by ~3e-3 (measured: trainbench --gradcheck out_max_err).
    # HIGHEST splits f32 mantissas into multiple bf16 passes for exact-f32
    # dots; bf16 operands need no splitting, so production cost is unchanged.
    prec = jax.lax.Precision.HIGHEST if vdtype == jnp.float32 else None
    if dot_mode == "dh4" and (HD % 128 or 128 % d):
        dot_mode = "dq"  # group slices need whole 128-lane tiles
    acc_shape = (NQ, d) if dot_mode == "qd" else (d, NQ)
    accs = [jnp.zeros(acc_shape, jnp.float32) for _ in range(h)]
    cnt = jnp.zeros((1, NQ), jnp.float32)
    for lt, (Ht, Wt) in enumerate(spatial_shapes):
        WinH, WinW = win[lt]
        cells = WinH * WinW
        wy0, wx0 = starts[lt]
        wy0f = wy0.astype(jnp.float32)
        wx0f = wx0.astype(jnp.float32)
        # envelope edge flags (win_envelope_mask semantics): a window
        # clamped to the level edge is exact for taps beyond it (the
        # missing cells don't exist / are zero padding = grid_sample's
        # zeros padding); W cells in [Wt, rup8(Wt)) are zero padding so
        # the x high edge tests against the TRUE level width.
        y_lo = wy0 == 0
        y_hi = wy0 + WinH == Ht
        x_lo = wx0 == 0
        x_hi = wx0 + WinW >= Wt
        # SEPARABLE splat build (measured 1.8x over the direct build at
        # the @1920 lq=0 geometry: 15.5 -> 8.5 ms/call): evaluate the
        # bilinear hats on the SMALL (WinW, NQ) / (WinH, NQ) planes —
        # ~9 VPU ops per tap on O(Win) elements — then expand by a 3D
        # broadcast-multiply into (WinH, WinW, NQ), which is 2 full-
        # plane ops instead of ~11.  The (cells, NQ) reshape merges the
        # leading dim into whole sublane tiles (WinW is 8-aligned), so
        # it is layout-free.
        ioH = jax.lax.broadcasted_iota(jnp.int32, (WinH, NQ), 0).astype(jnp.float32)
        ioW = jax.lax.broadcasted_iota(jnp.int32, (WinW, NQ), 0).astype(jnp.float32)
        copies[lt].wait()
        slab = slabs[lt][:].reshape(cells, HD)
        if dot_mode == "dqp":
            # ONE (cells, h, d) -> (h, cells, d) relayout per level; the
            # per-head operand then comes from a free major-axis slice
            # instead of eight 32-lane slices of the 256-lane slab (round-4
            # measurement: the full-slab dot with NO lane slices beat the
            # sliced per-head dots at 8x the MACs — the slices dominate).
            slab_t = slab.reshape(cells, h, d).transpose(1, 0, 2)
        S3_lanes = [] if dot_mode == "stack" else None
        for hh in range(h):
            if _DEBUG_STAGE in ("nosplat", "minimal"):
                c0 = (hh * L + lt) * P
                S3 = (
                    jnp.maximum(0.0, 1.0 - jnp.abs(ioH - yb[c0 : c0 + 1, :]))[
                        :, None, :
                    ]
                    * jnp.maximum(0.0, 1.0 - jnp.abs(ioW - xb[c0 : c0 + 1, :]))[
                        None, :, :
                    ]
                )
                if _DEBUG_STAGE == "minimal":
                    accs[hh] = accs[hh] + S3.reshape(cells, NQ)[: acc_shape[0], :]
                else:
                    accs[hh] = accs[hh] + jax.lax.dot_general(
                        slab[:, hh * d : (hh + 1) * d],
                        S3.reshape(cells, NQ).astype(vdtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                continue
            # per-tap SMALL planes first (hats + envelope bookkeeping)...
            hxs, hys = [], []
            for p in range(P):
                c = (hh * L + lt) * P + p
                # window-local pixel coords of this tap (grid_sample
                # align_corners=False convention: center at i+0.5)
                xp = xb[c : c + 1, :] * Wt - 0.5 - wx0f  # (1, NQ)
                yp = yb[c : c + 1, :] * Ht - 0.5 - wy0f
                wp = wb[c : c + 1, :]
                # in-envelope predicate on the (1, NQ) row — replaces
                # the caller-side K-sized mask/where passes.  STRICT < on
                # the high side: a tap exactly at WinW-1 has an exact
                # VALUE, but its one-sided gradient needs the WinW cell
                # (outside the window) — route it to the correction
                # (win_envelope_mask matches; round-5 kink-convention fix)
                ok = (
                    ((xp >= 0) | x_lo)
                    & ((xp < WinW - 1) | x_hi)
                    & ((yp >= 0) | y_lo)
                    & ((yp < WinH - 1) | y_hi)
                )
                wp = jnp.where(ok, wp, 0.0)
                cnt = cnt + jnp.where(
                    ok, 0.0, (wb[c : c + 1, :] != 0).astype(jnp.float32)
                )
                hxs.append(
                    jnp.maximum(0.0, 1.0 - jnp.abs(ioW - xp)).astype(sdt)
                )  # (WinW, NQ)
                hys.append(
                    jnp.maximum(0.0, wp - wp * jnp.abs(ioH - yp)).astype(sdt)
                )  # (WinH, NQ)
            # ...then the expansion into (ch, WinW, NQ) planes, CHUNKED on
            # the window's y axis so each broadcast product stays under
            # ~1.25 MB: Mosaic software-pipelines the per-tap products and
            # keeps ~7-15 of them live on the scoped-vmem stack regardless
            # of accumulation order (an explicit scratch accumulator was
            # tried and changed nothing: 29.65 MB either way at the lq2
            # (8,16) geometry) — bounding the PLANE size is what bounds the
            # stack.  The dot is linear in S, so per-chunk dots against the
            # matching slab rows accumulate exactly.
            # lanes pad to the 128 tile: a (ch, WinW, NQ<128) plane occupies
            # ch*WinW*128 vregs regardless of NQ (coarse-level tiles)
            ch_rows = max(1, _CHUNK_BYTES // (WinW * max(NQ, 128) * 4))
            chunks = (
                [(0, WinH)] if ch_rows >= WinH or dot_mode in ("stack",)
                else [
                    (c0, min(ch_rows, WinH - c0))
                    for c0 in range(0, WinH, ch_rows)
                ]
            )
            S3 = None
            for c0, ch in chunks:
                S3c = jnp.zeros((ch, WinW, NQ), sdt)
                for p in range(P):
                    S3c = S3c + hys[p][c0 : c0 + ch][:, None, :] * hxs[p][None, :, :]
                if len(chunks) == 1:
                    S3 = S3c
                    break
                seg = S3c.reshape(ch * WinW, NQ).astype(vdtype)
                r0, r1 = c0 * WinW, (c0 + ch) * WinW
                if dot_mode == "qd":
                    accs[hh] = accs[hh] + jax.lax.dot_general(
                        seg, slab[r0:r1, hh * d : (hh + 1) * d],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                else:  # dq / dqp / dh4 / debug stages reduce to dq when chunked
                    if dot_mode == "dh4":
                        g0 = (hh * d) // 128 * 128
                        lhs = slab[r0:r1, g0 : g0 + 128]
                    elif dot_mode == "dqp":
                        lhs = slab_t[hh][r0:r1]
                    else:
                        lhs = slab[r0:r1, hh * d : (hh + 1) * d]
                    res = jax.lax.dot_general(
                        lhs, seg,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    if dot_mode == "dh4":
                        res = res[hh * d - g0 : hh * d - g0 + d, :]
                    accs[hh] = accs[hh] + res
            if S3 is None:
                continue  # chunked: dots already accumulated
            if _DEBUG_STAGE == "nodot":
                accs[hh] = accs[hh] + S3.reshape(cells, NQ).astype(jnp.float32)[
                    : acc_shape[0], :
                ]
            elif _DEBUG_STAGE == "dotfull":
                # attribution: dot against the FULL 256-lane slab (8x the
                # MACs, M=256 output rows, NO 32-lane slab slice).  If this
                # is not ~8x slower than production, the per-head lane
                # slice / M=32 output waste dominates the dot cost.
                full = jax.lax.dot_general(
                    slab,
                    S3.reshape(cells, NQ).astype(vdtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (HD, NQ)
                accs[hh] = accs[hh] + full[hh * d : (hh + 1) * d, :]
            elif dot_mode == "stack":
                S3_lanes.append(S3.reshape(cells, NQ).astype(vdtype))
            elif dot_mode == "dqp":
                accs[hh] = accs[hh] + jax.lax.dot_general(
                    slab_t[hh],
                    S3.reshape(cells, NQ).astype(vdtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            elif dot_mode == "dh4":
                g0 = (hh * d) // 128 * 128
                grp = jax.lax.dot_general(
                    slab[:, g0 : g0 + 128],
                    S3.reshape(cells, NQ).astype(vdtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (128, NQ); the head's d rows are a free sublane slice
                accs[hh] = accs[hh] + grp[hh * d - g0 : hh * d - g0 + d, :]
            elif dot_mode == "dq":
                accs[hh] = accs[hh] + jax.lax.dot_general(
                    slab[:, hh * d : (hh + 1) * d],
                    S3.reshape(cells, NQ).astype(vdtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            else:
                accs[hh] = accs[hh] + jax.lax.dot_general(
                    S3.reshape(cells, NQ).astype(vdtype),
                    slab[:, hh * d : (hh + 1) * d],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
        if dot_mode == "stack":
            # ONE MXU dot per level: (cells, HD)^T-contract-(cells, h*NQ);
            # per-head results live in tile-aligned (32-row, NQ-lane) blocks
            # of the (HD, h*NQ) output — both extractions are cheap.  8x the
            # useful MACs, but every dot is full-width on both output axes.
            S_big = jnp.concatenate(S3_lanes, axis=-1)  # (cells, h*NQ)
            full = jax.lax.dot_general(
                slab, S_big,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (HD, h*NQ)
            for hh in range(h):
                accs[hh] = accs[hh] + full[
                    hh * d : (hh + 1) * d, hh * NQ : (hh + 1) * NQ
                ]
    if dot_mode in ("dq", "dqp", "dh4", "stack"):
        accs = [a.T for a in accs]
    out = jnp.concatenate(accs, axis=1)  # (NQ, h*d)
    if HD != h * d:  # caller 128-padded the lane dim
        out = jnp.pad(out, ((0, 0), (0, HD - h * d)))
    return out, cnt


def _coarse_fallback(value, spatial_shapes, x, y, w):
    """Exact whole-table gather for coarse query levels (<16-query tiles).

    Default "pair" (2 gather rows/tap over a 2-roll corner table): the
    round-4 standalone A/B at 1920x1280 measured reference(4-row) 30.4+14.8
    ms and pitched(1-row) 25.1+20.8 ms for the two coarse levels — pitched's
    corner-table build (pad + concat + 4 rolls over ~600 MB) dominates at
    these row counts, while the pair table is two rolls of a free reshape
    view.  All three are exact for any offsets."""
    from codetr_tpu.ops import msda as _m

    if _COARSE_IMPL == "reference":
        return _m.msda_reference_qm(value, spatial_shapes, x, y, w)
    if _COARSE_IMPL == "pitched":
        return _m.msda_pitched_gather_qm(value, spatial_shapes, x, y, w)
    return _m.msda_pair_gather_qm(value, spatial_shapes, x, y, w)


def msda_win_lq(
    value_lvls,  # list of (bs, Ht, rup8(Wt), HD) head-fused value slabs
    x_lq,  # (bs, h, L, P, Hq, Wq) fp32 sampling x in [0,1] for THIS query level
    y_lq,  # (bs, h, L, P, Hq, Wq)
    w_lq,  # (bs, h, L, P, Hq, Wq) attention weights (raw; masked IN-KERNEL)
    *,
    lq: int,
    spatial_shapes: Shapes,
    radius: int,
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
    dot_mode: str = "dh4",
):
    """One query level's windowed MSDA: returns ``(out, n_out)`` where out is
    (bs, Hq*Wq, HD) fp32 (HD = num_heads * head_dim, possibly 128-padded by
    the caller) and n_out is a scalar f32 count of out-of-envelope taps with
    nonzero weight.

    The envelope test (same semantics as ``win_envelope_mask``) runs INSIDE
    the kernel on per-tap (1, NQ) rows — a few sublane-row ops per tap —
    instead of as K-sized mask/where passes in the caller (which cost ~10
    HBM passes over the (bs,h,L,P,K) coordinate tensors, measured ~25 ms at
    1920x1280 in the _win_exact_ad wrapper).  Out-of-envelope taps are
    zeroed (their exact value is restored by the caller's correction, gated
    on the returned count).

    Heads are fused into the value's lane dimension so ONE window DMA per
    (tile, target level) serves all heads (Mosaic requires lane-dim DMA
    slices to cover whole 128-lane tiles, which a 32-wide per-head slice
    cannot; a 256-wide all-heads slice can).  The per-head 32-lane slab
    slice for the splat dot is a cheap in-VMEM relayout."""
    L = len(spatial_shapes)
    bs = x_lq.shape[0]
    h = num_heads
    d = head_dim
    P = x_lq.shape[3]
    HLP = h * L * P
    HD = value_lvls[0].shape[-1]
    Hq, Wq = spatial_shapes[lq]
    (th, tw), win = _win_geometry(lq, spatial_shapes, radius)
    nty, ntx = -(-Hq // th), -(-Wq // tw)
    NQ = th * tw

    # pad the query grid to tile multiples (coords beyond the grid carry
    # zero weights -> contribute nothing), then lay the coords out as
    # (bs, nty, ntx, HLP, NQ) so each block is the full trailing (HLP, NQ)
    # plane — always a legal Mosaic block shape.  Queries sit on the LANE
    # axis: the separable splat build slices per-tap (1, NQ) rows (a free
    # sublane slice) and broadcasts them against sublane-axis cell iotas.
    pad_y, pad_x = nty * th - Hq, ntx * tw - Wq

    def to_tiles(a):
        a = a.reshape(bs, HLP, Hq, Wq)
        if pad_y or pad_x:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad_y), (0, pad_x)))
        a = a.reshape(bs, HLP, nty, th, ntx, tw)
        return a.transpose(0, 2, 4, 1, 3, 5).reshape(bs, nty, ntx, HLP, NQ)

    # optimization_barrier on the OUTPUT of the tile interleave: XLA layout
    # assignment otherwise propagates the transpose's operand preference all
    # the way back to the (bs,h,L,P,K) coordinate tensors and materializes
    # them with P/L as the tiled minor dims — 51x tile padding, 6.2 GB per
    # tensor at 1920x1280 (observed in the HLO allocation dump: compile-OOM
    # on any graph holding two such programs).  A barrier on the SOURCE
    # tensors does NOT help (barriers are layout-transparent; the consumer's
    # preference flows through) — it must pin the interleave result, which
    # forces the whole chain into default layouts and a plain strided-copy
    # fusion (~3 ms per tensor at the lq=0 1920x1280 slice).
    xt, yt, wt = jax.lax.optimization_barrier(
        (to_tiles(x_lq), to_tiles(y_lq), to_tiles(w_lq))
    )
    vdtype = value_lvls[0].dtype

    def kernel(xr, yr, wr, *refs):
        # refs: L value HBM refs, out ref, count ref, L slab scratch, dma sems
        v_refs = refs[:L]
        out_ref = refs[L]
        cnt_ref = refs[L + 1]
        slabs = refs[L + 2 : L + 2 + L]
        sems = refs[-1]

        b = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        copies, starts = _start_window_copies(
            v_refs, slabs, sems, b, ty, tx, th=th, tw=tw, Hq=Hq, Wq=Wq,
            spatial_shapes=spatial_shapes, win=win, radius=radius,
        )

        xb = xr[0, 0, 0]  # (HLP, NQ) fp32
        yb = yr[0, 0, 0]
        wb = wr[0, 0, 0]
        out, cnt = _splat_tile(
            xb, yb, wb, slabs, copies, starts, spatial_shapes=spatial_shapes,
            win=win, h=h, d=d, P=P, L=L, NQ=NQ, HD=HD, vdtype=vdtype,
            dot_mode=dot_mode,
        )
        out_ref[0, 0, 0] = out
        cnt_ref[0, 0, 0] = jnp.concatenate(
            [cnt, jnp.zeros((7, NQ), jnp.float32)], axis=0
        )

    grid = (bs, nty, ntx)
    coord_spec = pl.BlockSpec(
        (1, 1, 1, HLP, NQ), lambda b, i, j: (b, i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        # values stay in HBM; the kernel manually DMAs window slabs
        in_specs=[coord_spec] * 3
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * L,
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, NQ, HD), lambda b, i, j: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 8, NQ), lambda b, i, j: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nty, ntx, NQ, HD), jnp.float32),
            jax.ShapeDtypeStruct((bs, nty, ntx, 8, NQ), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((wh, ww, HD), vdtype) for wh, ww in win]
        + [pltpu.SemaphoreType.DMA((L,))],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xt, yt, wt, *value_lvls)

    # (bs, nty, ntx, NQ, HD) -> (bs, Hq*Wq, HD)
    out = out.reshape(bs, nty, ntx, th, tw, HD).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(bs, nty * th, ntx * tw, HD)[:, :Hq, :Wq]
    return out.reshape(bs, Hq * Wq, HD), jnp.sum(cnt)


def msda_win_lq_packed(
    value_lvls,  # list of (bs, Ht, rup8(Wt), HD) head-fused value slabs
    cpk_lq,  # (bs, Hq, Wq, C) fp32 packed [x(HLP) | y(HLP) | w(HLP) | 0-pad]
    *,
    lq: int,
    spatial_shapes: Shapes,
    radius: int,
    num_heads: int,
    head_dim: int,
    num_points: int,
    interpret: bool = False,
    dot_mode: str = "dh4",
):
    """Packed-coordinate twin of ``msda_win_lq`` — the round-3 production
    encoder entry.  The caller keeps coordinates Q-MAJOR, packed on the
    channel axis exactly as the projections produce them; each tile's
    (th, tw, C) raster block is loaded via BlockSpec (sublane tw is a
    multiple of 8, lane C a multiple of 128 — both legal Mosaic slices) and
    transposed to (C, NQ) IN VMEM, so the (bs,h,L,P,K)->tiles interleave
    that cost 8.8 ms/call at 1920x1280 (ROUND3_NOTES.md) disappears, along
    with its optimization-barrier layout pinning.  The output is written as
    (th, tw, HD) raster blocks into a (bs, Hq, Wq, HD) array — a reshape
    away from the (bs, K, HD) the model consumes — eliminating the
    out-side un-tiling transpose as well."""
    L = len(spatial_shapes)
    bs = cpk_lq.shape[0]
    h, d, P = num_heads, head_dim, num_points
    HLP = h * L * P
    C = cpk_lq.shape[-1]
    assert C >= 3 * HLP, (C, HLP)
    HD = value_lvls[0].shape[-1]
    Hq, Wq = spatial_shapes[lq]
    (th, tw), win = _win_geometry(lq, spatial_shapes, radius)
    nty, ntx = -(-Hq // th), -(-Wq // tw)
    NQ = th * tw
    pad_y, pad_x = nty * th - Hq, ntx * tw - Wq
    if pad_y or pad_x:
        # padded queries carry zero weights -> contribute nothing
        cpk_lq = jnp.pad(cpk_lq, ((0, 0), (0, pad_y), (0, pad_x), (0, 0)))
    vdtype = value_lvls[0].dtype

    def kernel(cref, *refs):
        v_refs = refs[:L]
        out_ref = refs[L]
        cnt_ref = refs[L + 1]
        slabs = refs[L + 2 : L + 2 + L]
        sems = refs[-1]

        b = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        copies, starts = _start_window_copies(
            v_refs, slabs, sems, b, ty, tx, th=th, tw=tw, Hq=Hq, Wq=Wq,
            spatial_shapes=spatial_shapes, win=win, radius=radius,
        )

        # (th, tw, C) -> (NQ, C): tw is 8-aligned, so the merge is
        # layout-free; the transpose puts queries on the lane axis for the
        # separable splat build (Mosaic lowers the 2D transpose natively)
        cb = cref[0].reshape(NQ, C).T  # (C, NQ)
        xb = cb[0:HLP]
        yb = cb[HLP : 2 * HLP]
        wb = cb[2 * HLP : 3 * HLP]
        out, cnt = _splat_tile(
            xb, yb, wb, slabs, copies, starts, spatial_shapes=spatial_shapes,
            win=win, h=h, d=d, P=P, L=L, NQ=NQ, HD=HD, vdtype=vdtype,
            dot_mode=dot_mode,
        )
        out_ref[0] = out.reshape(th, tw, HD)
        cnt_ref[0, 0, 0] = jnp.concatenate(
            [cnt, jnp.zeros((7, NQ), jnp.float32)], axis=0
        )

    grid = (bs, nty, ntx)
    out, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, tw, C), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * L,
        out_specs=[
            pl.BlockSpec(
                (1, th, tw, HD), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 8, NQ), lambda b, i, j: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nty * th, ntx * tw, HD), jnp.float32),
            jax.ShapeDtypeStruct((bs, nty, ntx, 8, NQ), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((wh, ww, HD), vdtype) for wh, ww in win]
        + [pltpu.SemaphoreType.DMA((L,))],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(cpk_lq, *value_lvls)

    out = out[:, :Hq, :Wq].reshape(bs, Hq * Wq, HD)
    return out, jnp.sum(cnt)


def _build_value_lvls(value, spatial_shapes, interpret):
    """Per-level head-fused value slabs (bs, Ht, rup8(Wt), HD_pad): W padded
    to the sublane multiple, lanes to the 128 tile multiple (padded cells
    are zeros == grid_sample zeros padding, so exactness is unaffected)."""
    bs, K, h, d = value.shape
    HD = h * d
    HD_pad = HD if interpret else -(-HD // 128) * 128
    v_hm = value.reshape(bs, K, HD)
    lvl_start = np.concatenate(
        [[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])]
    )
    value_lvls = []
    for i, (Ht, Wt) in enumerate(spatial_shapes):
        lvl = jax.lax.slice_in_dim(
            v_hm, int(lvl_start[i]), int(lvl_start[i + 1]), axis=1
        ).reshape(bs, Ht, Wt, HD)
        if Wt % 8 or HD_pad != HD:
            lvl = jnp.pad(
                lvl, ((0, 0), (0, 0), (0, _rup8(Wt) - Wt), (0, HD_pad - HD))
            )
        value_lvls.append(lvl)
    return value_lvls, HD_pad, lvl_start


def unpack_coords_qmajor(cpk, num_heads, num_levels, num_points):
    """(bs, K, C) packed q-major coords -> q-minor (x, y, w), each
    (bs, h, L, P, K) fp32 — for the correction branches, the coarse-level
    oracle fallback, and the pair-table backward (all off the hot path)."""
    bs, K, _ = cpk.shape
    HLP = num_heads * num_levels * num_points
    t = cpk.transpose(0, 2, 1)  # (bs, C, K)
    shape = (bs, num_heads, num_levels, num_points, K)
    x = jax.lax.slice_in_dim(t, 0, HLP, axis=1).reshape(shape)
    y = jax.lax.slice_in_dim(t, HLP, 2 * HLP, axis=1).reshape(shape)
    w = jax.lax.slice_in_dim(t, 2 * HLP, 3 * HLP, axis=1).reshape(shape)
    return x, y, w


def pack_coords_qmajor(x, y, w, interpret=False):
    """q-minor (bs, h, L, P, K) coords -> packed q-major (bs, K, C) with the
    channel layout ``msda_win_qm_packed`` expects (tests / compatibility
    shim; the production model builds the packed tensor natively without
    any transpose — models/msda_module.py)."""
    bs, h, L, P, K = x.shape
    HLP = h * L * P
    cpk = jnp.concatenate(
        [a.reshape(bs, HLP, K) for a in (x, y, w)], axis=1
    ).transpose(0, 2, 1)
    C = 3 * HLP if interpret else -(-3 * HLP // 128) * 128
    if C != 3 * HLP:
        cpk = jnp.pad(cpk, ((0, 0), (0, 0), (0, C - 3 * HLP)))
    return cpk.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_shapes", "num_points", "radius", "interpret", "with_count",
        "dot_mode",
    ),
)
def msda_win_qm_packed(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    cpk: jax.Array,  # (bs, K, C) fp32 packed [x(HLP) | y(HLP) | w(HLP) | pad]
    num_points: int,
    radius: int = 4,
    interpret: bool = False,
    with_count: bool = False,
    dot_mode: str = "dh4",
):
    """Packed-coordinate windowed MSDA over all query levels; semantics
    identical to ``msda_win_qm`` (exact inside ``win_envelope_mask``'s
    domain, out-of-envelope taps zeroed in-kernel and counted), but with
    zero coordinate relayout on the hot path (see msda_win_lq_packed)."""
    bs, K, h, d = value.shape
    L = len(spatial_shapes)
    P = num_points
    HLP = h * L * P
    assert cpk.shape[0] == bs and cpk.shape[1] == K, cpk.shape
    assert cpk.shape[2] >= 3 * HLP, (cpk.shape, HLP)
    HD = h * d
    value_lvls, HD_pad, lvl_start = _build_value_lvls(value, spatial_shapes, interpret)

    outs = []
    counts = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        s, e = int(lvl_start[lq]), int(lvl_start[lq + 1])
        th, tw = _tile_shape_for_level(lq, L)
        if th * tw < 16:
            # coarse query levels (<2% of queries) — exact whole-table
            # gather, as in msda_win_qm (see there for the rationale).
            # PITCHED form (1 gather row per tap): the 4-row flat oracle
            # measured 30.4 + 14.8 ms for the two coarse levels at
            # 1920x1280 (round 4) — 45 ms of a ~55 ms call; pitched cuts
            # the rows 4x and its corner table is CSE'd with the
            # correction tier's (same value input).
            cl = jax.lax.slice_in_dim(cpk, s, e, axis=1)
            xl, yl, wl = unpack_coords_qmajor(cl, h, L, P)
            o = _coarse_fallback(value, spatial_shapes, xl, yl, wl).astype(
                jnp.float32
            )
            if HD_pad != HD:
                o = jnp.pad(o, ((0, 0), (0, 0), (0, HD_pad - HD)))
            outs.append(o)
            continue
        cl = jax.lax.slice_in_dim(cpk, s, e, axis=1).reshape(
            bs, Hq, Wq, cpk.shape[-1]
        )
        o, n = msda_win_lq_packed(
            value_lvls, cl, lq=lq, spatial_shapes=spatial_shapes,
            radius=radius, num_heads=h, head_dim=d, num_points=P,
            interpret=interpret, dot_mode=dot_mode,
        )
        outs.append(o)
        counts.append(n)
    out = jnp.concatenate(outs, axis=1)  # (bs, K, HD_pad)
    if HD_pad != HD:
        out = out[..., :HD]
    out = out.astype(value.dtype)
    if with_count:
        return out, sum(counts)
    return out


def win_envelope_mask(
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) normalized x
    y: jax.Array,  # (bs, h, L, P, K)
    *,
    radius: int = 4,
) -> jax.Array:
    """True where a tap lies inside the windowed kernel's exactness domain.

    A tap is exact iff every bilinear corner with nonzero hat weight that is
    inside the target level also lies inside its query-tile's window
    [w0, w0 + Win - 1] on both axes.  Window starts are static per tile
    index — precomputed per query row/col as numpy tables.  Taps whose
    in-level hats would fall below/above the window are flagged OUT unless
    the window is already clamped to the level edge on that side (then the
    missing cells do not exist and grid_sample zero-padding agrees)."""
    L = len(spatial_shapes)
    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])
    parts = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        Kq = Hq * Wq
        q0 = int(lvl_start[lq])
        (th0, tw0) = _tile_shape_for_level(lq, L)
        if th0 * tw0 < 16:
            # query level routed through the exact flat-gather oracle by
            # msda_win_qm (see there): exact for any offset -> in-envelope
            bsz, hh_, _, P_, _ = x.shape
            parts.append(
                jnp.ones((bsz, hh_, L, P_, Kq), bool)
            )
            continue
        xq = jax.lax.slice_in_dim(x, q0, q0 + Kq, axis=4).astype(jnp.float32)
        yq = jax.lax.slice_in_dim(y, q0, q0 + Kq, axis=4).astype(jnp.float32)
        (th, tw), win = _win_geometry(lq, spatial_shapes, radius)
        qrow = np.arange(Hq) // th  # tile index per query row
        qcol = np.arange(Wq) // tw
        lvl_masks = []
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            WinH, WinW = win[lt]
            wy0 = np.clip(qrow * th * Ht // Hq - radius, 0, Ht - WinH)
            wx0 = np.clip((qcol * tw * Wt // Wq - radius) // 8 * 8, 0, _rup8(Wt) - WinW)
            # per flattened query (row-major over (Hq, Wq))
            y0 = jnp.asarray(np.repeat(wy0, Wq), jnp.float32)
            x0 = jnp.asarray(np.tile(wx0, Hq), jnp.float32)
            y_edge_lo = jnp.asarray(np.repeat(wy0 == 0, Wq))
            y_edge_hi = jnp.asarray(np.repeat(wy0 + WinH == Ht, Wq))
            x_edge_lo = jnp.asarray(np.tile(wx0 == 0, Hq))
            # cells from Wt to rup8(Wt)-1 exist as zero padding, so a window
            # reaching the TRUE level edge is exact for any tap beyond it
            x_edge_hi = jnp.asarray(np.tile(wx0 + WinW >= Wt, Hq))
            yp = yq[:, :, lt] * Ht - 0.5  # (bs, h, P, Kq)
            xp = xq[:, :, lt] * Wt - 0.5
            # strict < on the high side: must match the in-kernel predicate
            # (one-sided gradient needs the cell beyond an exact-integer
            # tap at the window's last row/col — round-5 kink fix)
            ok_y = ((yp >= y0) | y_edge_lo) & ((yp < y0 + (WinH - 1)) | y_edge_hi)
            ok_x = ((xp >= x0) | x_edge_lo) & ((xp < x0 + (WinW - 1)) | x_edge_hi)
            lvl_masks.append(ok_y & ok_x)
        parts.append(jnp.stack(lvl_masks, axis=2))  # (bs, h, L, P, Kq)
    return jnp.concatenate(parts, axis=4)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "radius", "interpret", "with_count", "dot_mode"),
)
def msda_win_qm(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) fp32 normalized x
    y: jax.Array,  # (bs, h, L, P, K)
    w: jax.Array,  # (bs, h, L, P, K) attention weights (raw)
    radius: int = 4,
    interpret: bool = False,  # CPU/pallas-interpreter path for tests
    with_count: bool = False,
    dot_mode: str = "dh4",
):
    """Grid-query MSDA via the windowed splat-matmul kernel; q-minor
    coordinate layout, exact (grid_sample bilinear/zeros semantics) for taps
    inside ``win_envelope_mask``'s domain; out-of-envelope taps are zeroed
    by the kernel's in-envelope predicate (no caller-side masking needed).
    With ``with_count=True`` also returns the scalar f32 count of zeroed
    taps with nonzero weight, so the caller can gate its exactness
    correction without any K-sized mask pass.  Same signature family as
    msda_grid_shift_qm / msda_pair_gather_qm."""
    bs, K, h, d = value.shape
    L = len(spatial_shapes)
    P = x.shape[3]
    assert x.shape == (bs, h, L, P, K), x.shape
    HD = h * d
    value_lvls, HD_pad, lvl_start = _build_value_lvls(value, spatial_shapes, interpret)

    f32 = jnp.float32
    xq = x.astype(f32)
    yq = y.astype(f32)
    wq = w.astype(f32)

    outs = []
    counts = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        s, e = int(lvl_start[lq]), int(lvl_start[lq + 1])
        th, tw = _tile_shape_for_level(lq, L)
        if th * tw < 16:
            # Coarse query levels (<2% of queries; tiles of 8/4 queries):
            # the splat kernel's planes pad the NQ lane dim to 128 (up to
            # 32x), and their windows onto the stride-4 level are ~2.3k
            # cells — together they tip the 16 MB scoped-vmem limit inside
            # the full-model graph.  The exact flat-gather oracle costs
            # ~1-3 ms at these query counts (75M rows/s, ROUND3_NOTES.md)
            # and is exact for ANY offset, so it contributes 0 to the
            # out-of-envelope count.
            xl = jax.lax.slice_in_dim(xq, s, e, axis=4)
            yl = jax.lax.slice_in_dim(yq, s, e, axis=4)
            wl = jax.lax.slice_in_dim(wq, s, e, axis=4)
            o = _coarse_fallback(value, spatial_shapes, xl, yl, wl).astype(
                jnp.float32
            )  # (bs, Hq*Wq, HD)
            if HD_pad != HD:
                o = jnp.pad(o, ((0, 0), (0, 0), (0, HD_pad - HD)))
            outs.append(o)
            continue
        xl = jax.lax.slice_in_dim(xq, s, e, axis=4).reshape(bs, h, L, P, Hq, Wq)
        yl = jax.lax.slice_in_dim(yq, s, e, axis=4).reshape(bs, h, L, P, Hq, Wq)
        wl = jax.lax.slice_in_dim(wq, s, e, axis=4).reshape(bs, h, L, P, Hq, Wq)
        o, n = msda_win_lq(
            value_lvls, xl, yl, wl, lq=lq, spatial_shapes=spatial_shapes,
            radius=radius, num_heads=h, head_dim=d, interpret=interpret,
            dot_mode=dot_mode,
        )  # (bs, Hq*Wq, HD_pad), scalar
        outs.append(o)
        counts.append(n)
    out = jnp.concatenate(outs, axis=1)  # (bs, K, HD_pad)
    if HD_pad != HD:
        out = out[..., :HD]
    out = out.astype(value.dtype)
    if with_count:
        return out, sum(counts)
    return out
