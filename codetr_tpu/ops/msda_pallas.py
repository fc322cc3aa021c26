"""Pallas TPU kernel for grid-query MSDA (shift-window formulation).

The fused, VMEM-resident version of codetr_tpu.ops.msda_grid — the TPU analog
of the reference CUDA kernel + TRT plugin (ms_deform_attn.cu:211-261,
deformable_attention_plugin.cpp).  One pallas_call per (query level, target
level) pair (large multi-pair Mosaic programs compile pathologically); pairs
whose window exceeds ``max_window`` take the exact XLA im2col path
(_coarse_pair_xla).

Kernel design (v3 — the round-1 kernel spent ~85% of its time on redundant
halo DMA and unconditionally swept every window cell):

  grid = (bs*heads, q_tiles_y, q_tiles_x)
  1. LEVEL CACHE: the raw target level slab, transposed to (Ht, d*Wt), is
     DMA'd HBM->VMEM once per (batch, head) — replacing per-tile halo DMA
     whose nearest-repeated form carried up to g^2 = 256x redundant bytes
     (2.7 GB per encoder call at 608x608).
  2. WINDOW SLAB VIA TWO MXU DOTS: the tile's swept block, in layout
     (rows, d, x_phase, cols), is built with two dynamic 0/1 selection
     matmuls (row map then column map, both iota-comparison matrices).  The
     row map folds the nearest-repeat for coarser targets and the plain
     shift for same/finer; the column map additionally emits the x-phase
     split so every sweep read is a contiguous static slice.  Out-of-range
     rows select nothing == zero padding for free.
  3. SCALAR-GUARDED SPARSE SWEEP: bilinear hats give each tap support on at
     most 2x2 window cells, so a tile touches only the union of its taps'
     cells (~4P of W^2 = 121..729).  Per-tile tap bounding boxes (4 ints per
     point) are computed in XLA and arrive through SMEM; whole dy rows and
     individual (dy,dx) cells are skipped with pl.when on SCALAR-ONLY
     predicates.  (Guarding on jnp.max of vector data — kernel v2 — stalls
     the scalar core on the VPU at every cell and is catastrophically slow.)
     Active cells accumulate m * block straight into the fp32 out block.

Anchor/stride/window math is shared with msda_grid (_AxisPlan) — both
implementations are exact within the same offset envelope and are tested
against each other and the flat-gather oracle; out-of-envelope taps are
routed to the oracle by the dispatcher (ops/msda.py msda_grid_qm).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codetr_tpu.ops.msda_grid import _AxisPlan, _anchor, _ideal_scale, pair_margin

Shapes = Tuple[Tuple[int, int], ...]


class _PairPlan:
    """Static per-(lq, lt) geometry for one pair kernel.

    Per axis (from _AxisPlan): U[m] = target[m // repeat - pad], and query i
    at window offset dy reads U[sigma_i * i + sigma_d * dy + s0].  The v3
    kernel materializes a fully phase-split window slab per query tile,

        exp[phy, rr, :, phx, cc] = U_y[fy*(tile0_y + rr + qmin_y) + phy] x
                                   U_x[fx*(tile0_x + cc + qmin_x) + phx]

    (fy/fx = sigma_i, qmin = s0 // f), so the sweep read for window cell
    (dy, dx) is exp[(dy+s0y)%fy, (dy+s0y)//fy - qmin_y + [0,TQy), :,
    (dx+s0x)%fx, ...] — every index static, every slice contiguous."""

    def __init__(self, lq, lt, Hq, Wq, Ht, Wt, R, TQy, TQx, Hqp, Wqp, ky, kx,
                 sub_align: int = 8):
        self.R, self.W = R, 2 * R + 3
        self.py = _AxisPlan(Hqp, Ht, R, k=ky)
        self.px = _AxisPlan(Wqp, Wt, R, k=kx)
        W = self.W

        def axis_geom(plan, TQ, lane):
            f = plan.sigma_i
            qmin = plan.s0 // f
            qmax = (plan.sigma_d * (W - 1) + plan.s0) // f
            b = TQ + qmax - qmin + 1
            align = 128 if lane else sub_align
            return f, qmin, -(-b // align) * align

        self.fy, self.qminy, self.byp = axis_geom(self.py, TQy, False)
        self.fx, self.qminx, self.bxp = axis_geom(self.px, TQx, True)


def _coarse_pair_xla(v_t, x_l, y_l, w_l, Hq, Wq, Ht, Wt, R, bh, d, P):
    """Exact XLA fallback for coarse-query -> fine-target pairs whose Pallas
    window would blow up the unrolled kernel: TRUE rational anchors (so the
    window needs only the valid-ratio drift margin), one constant-index
    im2col gather, then an einsum contraction.  Kq here is tiny (<= ~1k
    queries), so the materialized patches are small.

    v_t (bh, Ht*Wt, d); x_l/y_l/w_l (bh, P, Kq).
    Returns (bh, d, Hq, Wq) fp32.
    """
    f32 = jnp.float32
    W = 2 * R + 3
    Kq = Hq * Wq
    ay = np.floor((np.arange(Hq) + 0.5) * (Ht / Hq) - 0.5).astype(np.int64)
    ax = np.floor((np.arange(Wq) + 0.5) * (Wt / Wq) - 0.5).astype(np.int64)

    pad = R + 2
    v_img = v_t.reshape(bh, Ht, Wt, d)
    v_pad = jnp.pad(v_img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Wtp = Wt + 2 * pad
    # constant patch indices: (Kq, W, W) into the padded flat image
    rows = (ay[:, None] + np.arange(W)[None, :] - (R + 1) + pad)  # (Hq, W)
    cols = (ax[:, None] + np.arange(W)[None, :] - (R + 1) + pad)  # (Wq, W)
    flat = (
        rows[:, None, :, None] * Wtp + cols[None, :, None, :]
    ).reshape(-1)  # (Kq*W*W,)
    patch = jnp.take(v_pad.reshape(bh, -1, d), jnp.asarray(flat), axis=1)
    patch = patch.reshape(bh, Kq, W, W, d).astype(f32)

    pos_x = x_l.astype(f32) * Wt - 0.5  # (bh, P, Kq)
    pos_y = y_l.astype(f32) * Ht - 0.5
    ty = pos_y - jnp.asarray(np.repeat(ay, Wq), f32) + (R + 1.0)
    tx = pos_x - jnp.asarray(np.tile(ax, Hq), f32) + (R + 1.0)
    dpos = jnp.arange(W, dtype=f32)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(ty[..., None] - dpos))  # (bh,P,Kq,W)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(tx[..., None] - dpos))
    m = jnp.einsum("bpqy,bpqx,bpq->bqyx", hy, hx, w_l.astype(f32),
                   precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bqyx,bqyxd->bqd", m, patch,
                     precision=jax.lax.Precision.HIGHEST)  # (bh, Kq, d)
    return out.reshape(bh, Hq, Wq, d).transpose(0, 3, 1, 2)


def _pair_kernel(plan, P, d, TQy, TQx, Htp, Wtp, accumulate,
                 u_ref, c_ref, b_ref, *refs):
    """One (lq, lt) pair, one query tile (see module docstring)."""
    if accumulate:
        acc_ref, out_ref, lvl_ref, exp_ref, sem = refs
    else:
        acc_ref = None
        out_ref, lvl_ref, exp_ref, sem = refs
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    @pl.when((ti == 0) & (tj == 0))
    def _load_level():
        cp = pltpu.make_async_copy(u_ref.at[b], lvl_ref, sem)
        cp.start()
        cp.wait()

    W = plan.W
    fy, byp, fx, bxp = plan.fy, plan.byp, plan.fx, plan.bxp
    vdt = lvl_ref.dtype
    py, px = plan.py, plan.px

    # ---- window slab via two selection dots (MXU) ----
    # rows: exp_rows[(phy, rr), :] = U_y[fy*(ti*TQy + rr + qmin_y) + phy]
    row0 = ti * TQy + plan.qminy
    rrf = jax.lax.broadcasted_iota(jnp.int32, (fy * byp, Htp), 0)
    uu = jax.lax.broadcasted_iota(jnp.int32, (fy * byp, Htp), 1)
    um = fy * (row0 + rrf % byp) + rrf // byp
    # U[m] = target[m // repeat - pad]; m >= 0 by _AxisPlan pad construction
    rmap = um // py.repeat - py.pad if py.repeat > 1 else um - py.pad
    ey = (uu == rmap).astype(vdt)
    r1 = jnp.dot(ey, lvl_ref[:, :], preferred_element_type=jnp.float32)
    # (fy*byp, d*Wtp) -> contract Wtp with the column selection
    r1 = r1.astype(vdt).reshape(fy * byp * d, Wtp)

    # cols: exp[.., phx, cc] = U_x[fx*(tj*TQx + cc + qmin_x) + phx]
    col0 = tj * TQx + plan.qminx
    ccf = jax.lax.broadcasted_iota(jnp.int32, (Wtp, fx * bxp), 1)
    uux = jax.lax.broadcasted_iota(jnp.int32, (Wtp, fx * bxp), 0)
    ucol = fx * (col0 + ccf % bxp) + ccf // bxp
    cmap = ucol // px.repeat - px.pad if px.repeat > 1 else ucol - px.pad
    ex = (uux == cmap).astype(vdt)
    r2 = jnp.dot(r1, ex, preferred_element_type=jnp.float32).astype(vdt)
    exp_ref[:, :, :, :, :] = r2.reshape(fy, byp, d, fx, bxp)

    # ---- scalar-guarded sparse sweep ----
    tys = c_ref[0, 0:P]  # (P, TQy, TQx)
    txs = c_ref[0, P : 2 * P]
    wws = c_ref[0, 2 * P : 3 * P]
    lo_y = [b_ref[0, 0, 0, 0, 0 * P + p] for p in range(P)]
    hi_y = [b_ref[0, 0, 0, 0, 1 * P + p] for p in range(P)]
    lo_x = [b_ref[0, 0, 0, 0, 2 * P + p] for p in range(P)]
    hi_x = [b_ref[0, 0, 0, 0, 3 * P + p] for p in range(P)]

    if accumulate:
        out_ref[0] = acc_ref[0]  # carry the previous pairs' accumulator
    else:
        out_ref[0] = jnp.zeros((TQy, d, TQx), out_ref.dtype)
    sdy, s0y = py.sigma_d, py.s0
    sdx, s0x = px.sigma_d, px.s0
    for dy in range(W):
        row_act = (lo_y[0] <= dy) & (dy <= hi_y[0])
        for p in range(1, P):
            row_act = row_act | ((lo_y[p] <= dy) & (dy <= hi_y[p]))

        @pl.when(row_act)
        def _row(dy=dy):
            hys = [
                jnp.maximum(0.0, 1.0 - jnp.abs(tys[p] - float(dy))) * wws[p]
                for p in range(P)
            ]
            offy = sdy * dy + s0y
            phy = offy % fy
            ry = offy // fy - plan.qminy
            for dx in range(W):
                cell = (lo_x[0] <= dx) & (dx <= hi_x[0]) & (lo_y[0] <= dy) & (
                    dy <= hi_y[0]
                )
                for p in range(1, P):
                    cell = cell | (
                        (lo_y[p] <= dy) & (dy <= hi_y[p])
                        & (lo_x[p] <= dx) & (dx <= hi_x[p])
                    )

                @pl.when(cell)
                def _cell(dy=dy, dx=dx, hys=hys, phy=phy, ry=ry):
                    m = jnp.zeros((TQy, TQx), jnp.float32)
                    for p in range(P):
                        hx = jnp.maximum(0.0, 1.0 - jnp.abs(txs[p] - float(dx)))
                        m = m + hys[p] * hx
                    offx = sdx * dx + s0x
                    phx = offx % fx
                    rx = offx // fx - plan.qminx
                    blk = exp_ref[
                        phy, ry : ry + TQy, :, phx, rx : rx + TQx
                    ]  # (TQy, d, TQx)
                    out_ref[0] = out_ref[0] + m[:, None, :] * blk.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "radius", "tile", "max_window", "interpret"),
)
def msda_grid_pallas_qm(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) normalized x in [0,1]
    y: jax.Array,  # (bs, h, L, P, K)
    w: jax.Array,  # (bs, h, L, P, K)
    *,
    radius: int = 4,
    tile: Tuple[int, int] = (16, 128),
    max_window: int = 31,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable entry: Pallas forward + flat-gather-oracle backward
    (jax.custom_vjp).  The reference computes gradients with 650 LoC of
    col2im CUDA (ms_deform_attn.cu:433-897); here the backward rides the
    exact XLA oracle's AD — identical gradients to the forward's truncated
    semantics wherever taps are strictly inside the window (a.e.)."""
    return _pallas_vjp(
        value, spatial_shapes, x, y, w, radius, tile, max_window, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7, 8))
def _pallas_vjp(value, spatial_shapes, x, y, w, radius, tile, max_window, interpret):
    return _pallas_impl(
        value, spatial_shapes, x, y, w,
        radius=radius, tile=tile, max_window=max_window, interpret=interpret,
    )


def _pallas_vjp_fwd(value, spatial_shapes, x, y, w, radius, tile, max_window, interpret):
    out = _pallas_impl(
        value, spatial_shapes, x, y, w,
        radius=radius, tile=tile, max_window=max_window, interpret=interpret,
    )
    return out, (value, x, y, w)


def _pallas_vjp_bwd(spatial_shapes, radius, tile, max_window, interpret, res, g):
    from codetr_tpu.ops.msda import msda_reference_qm

    value, x, y, w = res
    _, vjp = jax.vjp(
        lambda v, xx, yy, ww: msda_reference_qm(v, spatial_shapes, xx, yy, ww),
        value, x, y, w,
    )
    return vjp(g)


_pallas_vjp.defvjp(_pallas_vjp_fwd, _pallas_vjp_bwd)


def _pallas_impl(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    x: jax.Array,  # (bs, h, L, P, K) normalized x in [0,1]
    y: jax.Array,  # (bs, h, L, P, K)
    w: jax.Array,  # (bs, h, L, P, K)
    *,
    radius: int = 4,
    tile: Tuple[int, int] = (16, 128),
    max_window: int = 31,
    interpret: bool = False,
) -> jax.Array:
    bs, K, h, d = value.shape
    L = len(spatial_shapes)
    P = x.shape[3]
    assert x.shape[-1] == K
    bh = bs * h
    f32 = jnp.float32

    value_hm = value.transpose(0, 2, 1, 3).reshape(bh, K, d)
    loc_x = x.reshape(bh, L, P, K)
    loc_y = y.reshape(bh, L, P, K)
    attw = w.reshape(bh, L, P, K)

    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])

    # transposed level slabs (bh, Htp, d*Wtp): rows = target rows, cols =
    # (channel, target col) — the row-selection dot contracts target rows
    sub_lvl = 8 * (4 // value.dtype.itemsize)
    lvl_slabs = []
    lvl_dims = []
    for lt, (Ht, Wt) in enumerate(spatial_shapes):
        t0 = int(lvl_start[lt])
        v_t = jax.lax.slice_in_dim(value_hm, t0, t0 + Ht * Wt, axis=1)
        s = v_t.reshape(bh, Ht, Wt, d).transpose(0, 1, 3, 2)  # (bh, Ht, d, Wt)
        Htp = -(-Ht // sub_lvl) * sub_lvl
        Wtp = -(-Wt // 128) * 128
        s = jnp.pad(s, ((0, 0), (0, Htp - Ht), (0, 0), (0, Wtp - Wt)))
        lvl_slabs.append(s.reshape(bh, Htp, d * Wtp))
        lvl_dims.append((Htp, Wtp))

    out_chunks = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        Kq = Hq * Wq
        q0 = int(lvl_start[lq])
        sub = 8 * (4 // value.dtype.itemsize)

        def pick_tile(n, base, align):
            # choose among {base, 2*base}: least padded total, then fewest
            # launches (per-tile relaunch + slab-build overhead is real)
            best = None
            for c in (base, 2 * base):
                c = max(align, -(-c // align) * align)
                nt = -(-n // c)
                key = (nt * c, nt, c)
                if best is None or key < best:
                    best = key
            return best[2]

        TQy = pick_tile(Hq, max(tile[0], sub), sub)
        TQx = pick_tile(Wq, max(tile[1], 128), 128)
        nty = -(-Hq // TQy)
        ntx = -(-Wq // TQx)
        Hqp, Wqp = nty * TQy, ntx * TQx

        out = jnp.zeros((bh, d, Hq, Wq), f32)
        acc = None  # (bh, Hqp, d, Wqp) fp32, threaded through the pair kernels
        coarse_parts = []
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            R = radius + pair_margin(lq, lt)
            if 2 * R + 3 > max_window:
                # oversized window (coarse query -> much finer target): exact
                # XLA im2col path with true anchors and a drift-only margin
                t0 = int(lvl_start[lt])
                v_t = jax.lax.slice_in_dim(value_hm, t0, t0 + Ht * Wt, axis=1)
                x_l = jax.lax.slice_in_dim(loc_x, q0, q0 + Kq, axis=3)[:, lt]
                y_l = jax.lax.slice_in_dim(loc_y, q0, q0 + Kq, axis=3)[:, lt]
                w_l = jax.lax.slice_in_dim(attw, q0, q0 + Kq, axis=3)[:, lt]
                coarse_parts.append(
                    _coarse_pair_xla(
                        v_t, x_l, y_l, w_l, Hq, Wq, Ht, Wt, radius + 2, bh, d, P
                    )
                )
                continue

            plan = _PairPlan(
                lq, lt, Hq, Wq, Ht, Wt, R, TQy, TQx, Hqp, Wqp,
                _ideal_scale(Hq, Ht), _ideal_scale(Wq, Wt), sub_align=sub,
            )
            W = plan.W

            # window-frame coordinates + per-tile tap bounding boxes
            anch_y = _anchor(np.arange(Hq), Hq, Ht).astype(np.float32)
            anch_x = _anchor(np.arange(Wq), Wq, Wt).astype(np.float32)
            ay = jnp.asarray(np.broadcast_to(anch_y[:, None], (Hq, Wq)))
            ax = jnp.asarray(np.broadcast_to(anch_x[None, :], (Hq, Wq)))

            x_l = jax.lax.slice_in_dim(loc_x, q0, q0 + Kq, axis=3)[:, lt]
            y_l = jax.lax.slice_in_dim(loc_y, q0, q0 + Kq, axis=3)[:, lt]
            w_l = jax.lax.slice_in_dim(attw, q0, q0 + Kq, axis=3)[:, lt]
            pos_x = x_l.astype(f32).reshape(bh, P, Hq, Wq) * Wt - 0.5
            pos_y = y_l.astype(f32).reshape(bh, P, Hq, Wq) * Ht - 0.5
            ty = pos_y - ay + (R + 1.0)
            tx = pos_x - ax + (R + 1.0)
            ww = w_l.reshape(bh, P, Hq, Wq).astype(f32)

            pad_y, pad_x = Hqp - Hq, Wqp - Wq
            padc = ((0, 0), (0, 0), (0, pad_y), (0, pad_x))
            cat = jnp.concatenate(
                [
                    jnp.pad(ty, padc, constant_values=1e6),
                    jnp.pad(tx, padc, constant_values=1e6),
                    jnp.pad(ww, padc),
                ],
                axis=1,
            )  # (bh, 3P, Hqp, Wqp); pads sit far outside every window

            # per-tile tap bounds: hat support of tap t is {floor(t),
            # floor(t)+1}, so the tile's active cells per point form the
            # rectangle [floor(min t), floor(max t)+1] per axis (pads
            # excluded via +-inf masking)
            def tile_minmax(a, big):
                lo = jax.lax.reduce_window(
                    jnp.pad(a, padc, constant_values=big),
                    jnp.inf, jax.lax.min,
                    (1, 1, TQy, TQx), (1, 1, TQy, TQx), "valid",
                )
                hi = jax.lax.reduce_window(
                    jnp.pad(a, padc, constant_values=-big),
                    -jnp.inf, jax.lax.max,
                    (1, 1, TQy, TQx), (1, 1, TQy, TQx), "valid",
                )
                return lo, hi  # (bh, P, nty, ntx)

            ty_lo, ty_hi = tile_minmax(ty, 1e30)
            tx_lo, tx_hi = tile_minmax(tx, 1e30)

            def fl(a):
                return jnp.floor(jnp.clip(a, -100.0, W + 100.0)).astype(jnp.int32)

            bounds = jnp.stack(
                [fl(ty_lo), fl(ty_hi) + 1, fl(tx_lo), fl(tx_hi) + 1], axis=1
            )  # (bh, 4, P, nty, ntx)
            bounds = bounds.transpose(0, 3, 4, 1, 2).reshape(bh, nty, ntx, 1, 4 * P)

            Htp, Wtp = lvl_dims[lt]
            kernel = functools.partial(
                _pair_kernel, plan, P, d, TQy, TQx, Htp, Wtp, acc is not None
            )
            out_spec = pl.BlockSpec(
                (1, TQy, d, TQx),
                lambda b, i, j: (b, i, 0, j),
                memory_space=pltpu.VMEM,
            )
            in_specs = [
                pl.BlockSpec(memory_space=pl.ANY),  # level slab (HBM)
                pl.BlockSpec(
                    (1, 3 * P, TQy, TQx),
                    lambda b, i, j: (b, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                # SMEM blocks: last two dims must equal the array's,
                # hence the singleton axis
                pl.BlockSpec(
                    (1, 1, 1, 1, 4 * P),
                    lambda b, i, j: (b, i, j, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ]
            operands = [lvl_slabs[lt], cat, bounds]
            aliases = {}
            if acc is not None:
                # accumulate across pairs IN the kernel (donated alias):
                # per-pair partial outputs summed by XLA would double the
                # HBM traffic of the (bh, Hqp, d, Wqp) fp32 accumulator
                in_specs.append(out_spec)
                operands.append(acc)
                aliases = {3: 0}
            acc = pl.pallas_call(
                kernel,
                grid=(bh, nty, ntx),
                in_specs=in_specs,
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((bh, Hqp, d, Wqp), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((Htp, d * Wtp), value.dtype),  # level cache
                    pltpu.VMEM(
                        (plan.fy, plan.byp, d, plan.fx, plan.bxp), value.dtype
                    ),
                    pltpu.SemaphoreType.DMA,
                ],
                input_output_aliases=aliases,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
                interpret=interpret,
            )(*operands)
        if acc is not None:
            out = out + acc[:, :Hq, :, :Wq].transpose(0, 2, 1, 3)
        for part in coarse_parts:
            out = out + part
        # (bh, d, Hq, Wq) -> (bs, Kq, h*d)
        out = out.astype(value.dtype).reshape(bs, h, d, Kq).transpose(0, 3, 1, 2)
        out_chunks.append(out.reshape(bs, Kq, h * d))

    return jnp.concatenate(out_chunks, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "radius", "tile", "max_window", "interpret"),
)
def msda_grid_pallas(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    sampling_locations: jax.Array,  # (bs, K, h, L, P, 2)
    attention_weights: jax.Array,  # (bs, K, h, L, P)
    *,
    radius: int = 4,
    tile: Tuple[int, int] = (16, 128),
    max_window: int = 31,
    interpret: bool = False,
) -> jax.Array:
    """Reference-layout wrapper over the q-minor core."""
    loc = sampling_locations.transpose(0, 2, 3, 4, 5, 1)  # (bs,h,L,P,2,K)
    attw = attention_weights.transpose(0, 2, 3, 4, 1)
    return msda_grid_pallas_qm(
        value,
        spatial_shapes,
        loc[..., 0, :],
        loc[..., 1, :],
        attw,
        radius=radius,
        tile=tile,
        max_window=max_window,
        interpret=interpret,
    )
