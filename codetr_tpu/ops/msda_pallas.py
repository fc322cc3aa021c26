"""Pallas TPU kernel for grid-query MSDA (shift-window formulation).

The fused, VMEM-resident version of codetr_tpu.ops.msda_grid — the TPU analog
of the reference CUDA kernel + TRT plugin (ms_deform_attn.cu:211-261,
deformable_attention_plugin.cpp).  The XLA version of the shift-window loop
leaves every window position as a separate HBM-streaming kernel (~356 ms/call
at 1152x768); this kernel holds the per-pair aligned value slab, the query
tile coordinates, and the accumulator in VMEM, so the window sweep runs at
VPU rate.

Structure (one small pallas_call per (query level, target level) pair —
large multi-pair Mosaic programs compile pathologically and spill past the
128MB v5e VMEM; per-pair outputs are summed by XLA):
  grid = (bs*heads, q_tiles_y, q_tiles_x)
  DMA the tile's halo block of U_lt (HBM->VMEM)
  for (dy, dx) in window(lq, lt):                # static unroll
    m   = sum_p w_p * hat(ty_p - dy) * hat(tx_p - dx)    # bilinear splat
    acc += m * U_block[phase(dy), phase(dx), :, slice, slice]
Pairs whose window exceeds max_window (coarse query -> much finer target)
take the exact XLA im2col path (_coarse_pair_xla) instead.

U_lt is the anchor-aligned target level built in XLA (zero-padded, nearest-
repeated for coarser targets, phase-split for finer targets so all in-kernel
reads are contiguous slices).  Anchor/stride/window math is shared with
msda_grid (_AxisPlan) — both implementations are exact within the same offset
envelope and are tested against each other and the flat-gather oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codetr_tpu.ops.msda_grid import _AxisPlan, _anchor, pair_margin

Shapes = Tuple[Tuple[int, int], ...]


class _PairPlan:
    """Static per-(lq, lt) layout: axis plans, phase-split factors, halo
    block geometry for a (TQy, TQx) query tile.

    ``select`` marks pairs whose target is same-or-coarser on both axes
    (sigma_i == 1): those kernels cache the raw level slab in VMEM once per
    (batch, head) and build the tile's window block with dynamic 0/1
    selection matmuls on the MXU (rows/cols picked by iota comparison) —
    replacing the per-tile halo DMA whose nearest-repeated form carried up to
    g^2 = 256x redundant bytes (the dominant cost of the round-1 kernel:
    2.7 GB DMA per encoder call at 608x608)."""

    def __init__(self, lq, lt, Hq, Wq, Ht, Wt, R, TQy, TQx, Hqp, Wqp, ky, kx,
                 sub_align: int = 8):
        # plans span the tile-PADDED query grid (Hqp, Wqp) so halo DMAs for
        # padded tiles stay in range; ky/kx are the scales from REAL sizes.
        self.R, self.W = R, 2 * R + 3
        self.py = _AxisPlan(Hqp, Ht, R, k=ky)
        self.px = _AxisPlan(Wqp, Wt, R, k=kx)
        # phase factors (stride per query step along U)
        self.fy = self.py.sigma_i
        self.fx = self.px.sigma_i
        # offsets swept by dy: sigma_d*dy + s0 for dy in [0, W)
        offs_y = self.py.sigma_d * np.arange(self.W) + self.py.s0
        offs_x = self.px.sigma_d * np.arange(self.W) + self.px.s0
        # phase-split: U row (f*i + off) lives at (ny=i + off//f, phase=off%f)
        self.oy = offs_y // self.fy
        self.phy = offs_y % self.fy
        self.ox = offs_x // self.fx
        self.phx = offs_x % self.fx
        # DMA starts must sit on VMEM tile boundaries (8 sublanes, 128
        # lanes).  The dynamic part ti*TQy is a multiple of the tiling (TQy,
        # TQx are tile multiples); floor-align the static offset and absorb
        # the residue in the in-kernel static slice offsets.
        # sub_align: sublane tile = 8 * (4 / itemsize) rows (16 for bf16)
        self.oy0 = (int(self.oy.min()) // sub_align) * sub_align
        self.ox0 = (int(self.ox.min()) // 128) * 128
        # halo block extents for a (TQy, TQx) query tile, rounded up to the
        # VMEM tiling — Mosaic also requires aligned DMA slice shapes
        self.by = -(-(TQy + int(self.oy.max()) - self.oy0) // sub_align) * sub_align
        self.bx = -(-(TQx + int(self.ox.max()) - self.ox0) // 128) * 128
        # U extents (phase-split units) covering every tile's padded block
        nty = Hqp // TQy
        ntx = Wqp // TQx
        self.ny = max(-(-self.py.ulen // self.fy), (nty - 1) * TQy + self.oy0 + self.by)
        self.nx = max(-(-self.px.ulen // self.fx), (ntx - 1) * TQx + self.ox0 + self.bx)
        self.select = self.fy == 1 and self.fx == 1  # same-or-coarser target


def _build_u(value_lt, plan: _PairPlan, bh, d):
    """(bh, Ht*Wt, d)-slice -> phase-split aligned slab
    (bh, fy, fx, d, ny, nx), zero-padded."""
    Ht, Wt = plan.py.nt, plan.px.nt
    v = value_lt.reshape(bh, Ht, Wt, d).transpose(0, 3, 1, 2)  # (bh, d, Ht, Wt)
    u = plan.py.build(v, axis=2)
    u = plan.px.build(u, axis=3)
    # pad to phase multiples
    pad_y = plan.ny * plan.fy - u.shape[2]
    pad_x = plan.nx * plan.fx - u.shape[3]
    u = jnp.pad(u, ((0, 0), (0, 0), (0, pad_y), (0, pad_x)))
    u = u.reshape(bh, d, plan.ny, plan.fy, plan.nx, plan.fx)
    return u.transpose(0, 3, 5, 1, 2, 4)  # (bh, fy, fx, d, ny, nx)


def _sweep(plan, P, d, TQy, TQx, c_ref, out_ref, read_blk):
    """Shared window sweep with hierarchical zero-skipping.

    The bilinear hats give each tap support on at most 2x2 window positions,
    so a tile's queries touch only the UNION of their taps' cells (~4P of
    W^2 = 121..729 at init) — the round-1 kernel burned ~15x redundant
    vector work sweeping every position unconditionally.  Skip whole dy rows
    whose hat mass is zero (pl.when on a cheap reduce), then skip individual
    (dy,dx) cells the same way; active cells accumulate straight into the
    fp32 out_ref block (revisited in VMEM, written once to HBM)."""
    W = plan.W
    tys = c_ref[0, 0:P]
    txs = c_ref[0, P : 2 * P]
    wws = c_ref[0, 2 * P : 3 * P]

    out_ref[0] = jnp.zeros((d, TQy, TQx), out_ref.dtype)
    for dy in range(W):
        hys = [
            jnp.maximum(0.0, 1.0 - jnp.abs(tys[p] - float(dy))) * wws[p]
            for p in range(P)
        ]
        row_m = hys[0]
        for p in range(1, P):
            row_m = row_m + hys[p]

        @pl.when(jnp.max(row_m) > 0.0)
        def _row(dy=dy, hys=hys):
            for dx in range(W):
                m = jnp.zeros((TQy, TQx), jnp.float32)
                for p in range(P):
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(txs[p] - float(dx)))
                    m = m + hys[p] * hx

                @pl.when(jnp.max(m) > 0.0)
                def _cell(dy=dy, dx=dx, m=m):
                    blk = read_blk(dy, dx)  # (d, TQy, TQx)
                    out_ref[0] = out_ref[0] + m[None] * blk.astype(jnp.float32)


def _pair_kernel(plan, P, d, TQy, TQx, u_ref, c_ref, out_ref, scratch, sem):
    """Finer-target (phase-split) pair, one query tile: DMA the halo block of
    the XLA-prebuilt U slab, sweep the window with static slices.  Kernels
    are kept small (one pair each) — large Mosaic programs compile
    pathologically and oversized live values spill past the 128MB v5e VMEM."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    by, bx = plan.by, plan.bx
    row0 = ti * TQy + plan.oy0
    col0 = tj * TQx + plan.ox0
    src = u_ref.at[b, :, :, :, pl.ds(row0, by), pl.ds(col0, bx)]
    cp = pltpu.make_async_copy(src, scratch, sem)
    cp.start()
    cp.wait()

    sdy, s0y, fy = plan.py.sigma_d, plan.py.s0, plan.fy
    sdx, s0x, fx = plan.px.sigma_d, plan.px.s0, plan.fx

    def read_blk(dy, dx):
        offy = sdy * dy + s0y
        offx = sdx * dx + s0x
        ry = offy // fy - plan.oy0
        rx = offx // fx - plan.ox0
        return scratch[offy % fy, offx % fx, :, ry : ry + TQy, rx : rx + TQx]

    _sweep(plan, P, d, TQy, TQx, c_ref, out_ref, read_blk)


def _pair_kernel_select(plan, P, d, TQy, TQx, u_ref, c_ref, out_ref, lvl_ref,
                        exp_ref, sem):
    """Same-or-coarser-target pair: cache the RAW level slab in VMEM once per
    (batch*head), then per tile build the window block with two dynamic 0/1
    selection matmuls (MXU):

        exp[c, rr, cc] = lvl[c, (row0+rr)//gy - pad_y, (col0+cc)//gx - pad_x]

    The row/col maps are affine-with-integer-div in the tile index, so the
    selection matrices come from broadcasted_iota comparisons; out-of-range
    rows select nothing, which reproduces the zero padding for free.  This
    replaces the nearest-repeated halo DMA (g^2-redundant bytes) with
    ~level-sized DMA once per bh + a few hundred MXU MACs per tile."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    @pl.when((ti == 0) & (tj == 0))
    def _load_level():
        cp = pltpu.make_async_copy(u_ref.at[b], lvl_ref, sem)
        cp.start()
        cp.wait()

    by, bx = plan.by, plan.bx
    gy, gx = plan.py.repeat, plan.px.repeat
    Htp, Wtp = lvl_ref.shape[1], lvl_ref.shape[2]
    row0 = ti * TQy + plan.oy0
    col0 = tj * TQx + plan.ox0
    vdt = lvl_ref.dtype

    rsel = (
        row0 + jax.lax.broadcasted_iota(jnp.int32, (by, Htp), 0)
    ) // gy - plan.py.pad
    ey = (jax.lax.broadcasted_iota(jnp.int32, (by, Htp), 1) == rsel).astype(vdt)
    csel = (
        col0 + jax.lax.broadcasted_iota(jnp.int32, (Wtp, bx), 1)
    ) // gx - plan.px.pad
    ex = (jax.lax.broadcasted_iota(jnp.int32, (Wtp, bx), 0) == csel).astype(vdt)
    for dd in range(d):
        t1 = jnp.dot(ey, lvl_ref[dd], preferred_element_type=jnp.float32)
        exp_ref[dd] = jnp.dot(
            t1.astype(vdt), ex, preferred_element_type=jnp.float32
        ).astype(vdt)

    sdy, s0y = plan.py.sigma_d, plan.py.s0
    sdx, s0x = plan.px.sigma_d, plan.px.s0

    def read_blk(dy, dx):
        ry = sdy * dy + s0y - plan.oy0
        rx = sdx * dx + s0x - plan.ox0
        return exp_ref[:, ry : ry + TQy, rx : rx + TQx]

    _sweep(plan, P, d, TQy, TQx, c_ref, out_ref, read_blk)


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
    # coordinate layout (bh, L, P, K) — already q-minor from the module
    loc_x = x.reshape(bh, L, P, K)
    loc_y = y.reshape(bh, L, P, K)
    attw = w.reshape(bh, L, P, K)

    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in spatial_shapes])])

    # raw level slabs (bh, d, Htp, Wtp) shared by all select-mode pairs
    sub_lvl = 8 * (4 // value.dtype.itemsize)
    lvl_slabs = []
    for lt, (Ht, Wt) in enumerate(spatial_shapes):
        t0 = int(lvl_start[lt])
        v_t = jax.lax.slice_in_dim(value_hm, t0, t0 + Ht * Wt, axis=1)
        s = v_t.reshape(bh, Ht, Wt, d).transpose(0, 3, 1, 2)  # (bh, d, Ht, Wt)
        Htp = -(-Ht // sub_lvl) * sub_lvl
        Wtp = -(-Wt // 128) * 128
        lvl_slabs.append(jnp.pad(s, ((0, 0), (0, 0), (0, Htp - Ht), (0, Wtp - Wt))))
    out_chunks = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        Kq = Hq * Wq
        q0 = int(lvl_start[lq])
        sub = 8 * (4 // value.dtype.itemsize)
        TQy = min(max(tile[0], sub), max(sub, -(-Hq // sub) * sub))
        TQx = min(tile[1], max(128, Wq))
        nty = -(-Hq // TQy)
        ntx = -(-Wq // TQx)
        Hqp, Wqp = nty * TQy, ntx * TQx

        plans = []
        u_arrays = []
        coord_arrays = []
        coarse_parts = []
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            R = radius + pair_margin(lq, lt)
            from codetr_tpu.ops.msda_grid import _ideal_scale

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

            sub_align = 8 * (4 // value.dtype.itemsize)
            plan = _PairPlan(
                lq, lt, Hq, Wq, Ht, Wt, R, TQy, TQx, Hqp, Wqp,
                _ideal_scale(Hq, Ht), _ideal_scale(Wq, Wt),
                sub_align=sub_align,
            )
            plans.append(plan)
            if plan.select:
                u_arrays.append(lvl_slabs[lt])
            else:
                t0 = int(lvl_start[lt])
                v_t = jax.lax.slice_in_dim(value_hm, t0, t0 + Ht * Wt, axis=1)
                u_arrays.append(_build_u(v_t, plan, bh, d))

            anch_y = _anchor(np.arange(Hq), Hq, Ht).astype(np.float32)
            anch_x = _anchor(np.arange(Wq), Wq, Wt).astype(np.float32)
            ay = jnp.asarray(np.broadcast_to(anch_y[:, None], (Hq, Wq)))
            ax = jnp.asarray(np.broadcast_to(anch_x[None, :], (Hq, Wq)))

            x_l = jax.lax.slice_in_dim(loc_x, q0, q0 + Kq, axis=3)[:, lt]  # (bh,P,Kq)
            y_l = jax.lax.slice_in_dim(loc_y, q0, q0 + Kq, axis=3)[:, lt]
            w_l = jax.lax.slice_in_dim(attw, q0, q0 + Kq, axis=3)[:, lt]  # (bh,P,Kq)
            pos_x = x_l.astype(f32).reshape(bh, P, Hq, Wq) * Wt - 0.5
            pos_y = y_l.astype(f32).reshape(bh, P, Hq, Wq) * Ht - 0.5
            ty = pos_y - ay + (R + 1.0)
            tx = pos_x - ax + (R + 1.0)
            ww = w_l.reshape(bh, P, Hq, Wq).astype(f32)
            cat = jnp.concatenate([ty, tx, ww], axis=1)  # (bh, 3P, Hq, Wq)
            # pad query grid to tile multiples; window coords in pad -> far
            # outside [0, W) so hats are 0 there
            cat = jnp.pad(
                cat,
                ((0, 0), (0, 0), (0, Hqp - Hq), (0, Wqp - Wq)),
                constant_values=-1e6,
            )
            coord_arrays.append(cat)

        out = jnp.zeros((bh, d, Hq, Wq), jnp.float32)
        grid = (bh, nty, ntx)
        for plan, u_arr, cat in zip(plans, u_arrays, coord_arrays):
            if plan.select:
                kernel = functools.partial(_pair_kernel_select, plan, P, d, TQy, TQx)
                scratch_shapes = [
                    pltpu.VMEM(u_arr.shape[1:], value.dtype),  # level cache
                    pltpu.VMEM((d, plan.by, plan.bx), value.dtype),  # expanded
                    pltpu.SemaphoreType.DMA,
                ]
            else:
                kernel = functools.partial(_pair_kernel, plan, P, d, TQy, TQx)
                scratch_shapes = [
                    pltpu.VMEM((plan.fy, plan.fx, d, plan.by, plan.bx), value.dtype),
                    pltpu.SemaphoreType.DMA,
                ]
            pair_out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    # the value slab stays in HBM; the kernel DMAs its halo
                    # block / level cache (ANY lets the compiler pick VMEM and
                    # blow the scoped budget)
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec(
                        (1, 3 * P, TQy, TQx),
                        lambda b, i, j: (b, 0, i, j),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, d, TQy, TQx), lambda b, i, j: (b, 0, i, j), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((bh, d, Hqp, Wqp), jnp.float32),
                scratch_shapes=scratch_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
                interpret=interpret,
            )(u_arr, cat)
            out = out + pair_out[:, :, :Hq, :Wq]
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
