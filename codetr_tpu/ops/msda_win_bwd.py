"""Fused backward for the windowed splat-matmul MSDA encoder kernel.

Round-3 shipped the windowed FORWARD (ops/msda_win.py) but routed its
backward through the encoder-scale pair-gather VJP — 130/773 ms per call at
608/1920, making training at flagship scale unshippable (round-3 VERDICT
item 4).  This kernel computes the gradients with the SAME window geometry
as the forward (reference analog: the tuned col2im backward kernels,
ms_deform_attn.cu:433-897):

Per (batch, query-tile), with the forward's window slabs re-DMA'd:

- grad_value: for each (head, level) rebuild the splat matrix S (the
  forward's separable-hat construction) and accumulate one MXU dot
  ``gV_slab_h (cells, d) = S_h (cells, NQ) @ g_h (NQ, d)``, then
  read-modify-write the tile's window of the grad_value level in HBM.  The
  TPU grid is sequential on the single TensorCore and both the read and the
  write of the overlapping windows are MANUAL DMAs awaited inside the grid
  cell, so overlapping tiles cannot race.
- grad_coords / grad_weights: with ``M_h (cells, NQ) = slab_h @ g_h^T``
  (one MXU dot), each tap's gradients are separable reductions against the
  hat derivatives: ``A = sum_ix hx*M``, ``A' = sum_ix dhx*M`` (two
  full-plane multiply-reduces per tap), then on small (WinH, NQ) planes
  ``dw = sum_iy hy0*A``, ``dy = w*sum_iy dhy*A``, ``dx = w*sum_iy hy0*A'``.
  Out-of-envelope taps (zeroed by the forward kernel) get zero gradients
  here; the caller adds the correction tier's gradients for them
  (ops/msda.py:_win_exact_ad_packed_bwd).

Cost: ~6 full-plane VPU ops per tap (vs the forward's 2) + 2 MXU dots per
(head, level) (vs 1) + the slab DMA twice (value read + grad RMW) — i.e.
backward ~= 3x forward by construction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codetr_tpu.ops.msda_win import (
    _CHUNK_BYTES,
    _compiler_params,
    _rup8,
    _win_geometry,
    _win_start_x,
    _win_start_y,
)

Shapes = Tuple[Tuple[int, int], ...]


def msda_win_lq_packed_bwd(
    value_lvls,  # list of (bs, Ht, rup8(Wt), HD) head-fused value slabs
    gval_lvls,  # list of (bs, Ht, rup8(Wt), HD) f32 grad accumulators (donated)
    cpk_lq,  # (bs, nty*th, ntx*tw, C) fp32 packed coords (tile-padded)
    g_lq,  # (bs, nty*th, ntx*tw, HD) f32 upstream grad (tile-padded)
    *,
    lq: int,
    spatial_shapes: Shapes,
    radius: int,
    num_heads: int,
    head_dim: int,
    num_points: int,
    interpret: bool = False,
):
    """One query level's windowed MSDA backward.

    Returns ``(gval_lvls_out, gcpk (bs, nty*th, ntx*tw, C) f32)``.  The
    ``gval_lvls`` inputs are donated (input_output_aliased): the kernel
    read-modify-writes each tile's windows, so contributions accumulate
    across tiles AND across per-level calls chained through these arrays."""
    L = len(spatial_shapes)
    n_lv = L
    bs = cpk_lq.shape[0]
    h, d, P = num_heads, head_dim, num_points
    HLP = h * L * P
    C = cpk_lq.shape[-1]
    HD = value_lvls[0].shape[-1]
    Hq, Wq = spatial_shapes[lq]
    (th, tw), win = _win_geometry(lq, spatial_shapes, radius)
    nty, ntx = -(-Hq // th), -(-Wq // tw)
    NQ = th * tw
    assert cpk_lq.shape[1] == nty * th and cpk_lq.shape[2] == ntx * tw, (
        cpk_lq.shape, nty * th, ntx * tw)
    assert g_lq.shape == (bs, nty * th, ntx * tw, HD), g_lq.shape
    vdtype = value_lvls[0].dtype

    def kernel(cref, gref, *refs):
        v_refs = refs[:n_lv]
        # refs[n_lv : 2*n_lv] are the aliased gval INPUT refs — all access
        # goes through the aliased outputs below
        gv_out = refs[2 * n_lv : 3 * n_lv]
        gcpk_ref = refs[3 * n_lv]
        slabs = refs[3 * n_lv + 1 : 4 * n_lv + 1]
        gslabs = refs[4 * n_lv + 1 : 5 * n_lv + 1]
        sems = refs[-1]

        b = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)

        v_copies, g_copies, starts = [], [], []
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            WinH, WinW = win[lt]
            wy0 = _win_start_y(ty, th, Hq, Ht, radius, WinH)
            wx0 = _win_start_x(tx, tw, Wq, Wt, radius, WinW)
            cv = pltpu.make_async_copy(
                v_refs[lt].at[b, pl.ds(wy0, WinH), pl.ds(wx0, WinW), :],
                slabs[lt],
                sems.at[lt],
            )
            cv.start()
            cg = pltpu.make_async_copy(
                gv_out[lt].at[b, pl.ds(wy0, WinH), pl.ds(wx0, WinW), :],
                gslabs[lt],
                sems.at[n_lv + lt],
            )
            cg.start()
            v_copies.append(cv)
            g_copies.append(cg)
            starts.append((wy0, wx0))

        cb = cref[0].reshape(NQ, C).T  # (C, NQ) f32
        xb = cb[0:HLP]
        yb = cb[HLP : 2 * HLP]
        wb = cb[2 * HLP : 3 * HLP]
        gb = gref[0].reshape(NQ, HD)  # (NQ, HD) f32
        # MXU precision (see _splat_tile): bf16 models dot bf16 operands
        # (exact single pass, f32 accumulation); f32 models need HIGHEST or
        # the M-plane picks up ~4e-3 bf16-pass error that the cancelling
        # hat-derivative reductions amplify ~50x in grad_coords (measured
        # 0.197 rel on chip vs the oracle before this).
        if vdtype == jnp.float32:
            mdt, prec = jnp.float32, jax.lax.Precision.HIGHEST
        else:
            mdt, prec = vdtype, None

        grow_x = {}
        grow_y = {}
        grow_w = {}
        write_copies = []
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            WinH, WinW = win[lt]
            cells = WinH * WinW
            wy0, wx0 = starts[lt]
            wy0f = wy0.astype(jnp.float32)
            wx0f = wx0.astype(jnp.float32)
            y_lo = wy0 == 0
            y_hi = wy0 + WinH == Ht
            x_lo = wx0 == 0
            x_hi = wx0 + WinW >= Wt
            ioH = jax.lax.broadcasted_iota(jnp.int32, (WinH, NQ), 0).astype(
                jnp.float32
            )
            ioW = jax.lax.broadcasted_iota(jnp.int32, (WinW, NQ), 0).astype(
                jnp.float32
            )
            v_copies[lt].wait()
            g_copies[lt].wait()
            slab = slabs[lt][:].reshape(cells, HD)
            gvs = []
            for hh in range(h):
                g_h = gb[:, hh * d : (hh + 1) * d]  # (NQ, d) f32
                # M = slab_h @ g_h^T: the "value-times-grad" plane every
                # coordinate gradient reduces against.  The 32-lane slab
                # slice matches the forward's dq dot operand (Mosaic rejects
                # the (cells, HD) -> (cells, h, d) lane-split reshape:
                # "unsupported shape cast").
                M = jax.lax.dot_general(
                    slab[:, hh * d : (hh + 1) * d].astype(mdt),
                    g_h.astype(mdt),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (cells, NQ)
                M3 = M.reshape(WinH, WinW, NQ)
                # per-tap SMALL planes first...
                taps = []
                for p in range(P):
                    c = (hh * L + lt) * P + p
                    xp = xb[c : c + 1, :] * Wt - 0.5 - wx0f  # (1, NQ)
                    yp = yb[c : c + 1, :] * Ht - 0.5 - wy0f
                    ok = (
                        ((xp >= 0) | x_lo)
                        & ((xp < WinW - 1) | x_hi)
                        & ((yp >= 0) | y_lo)
                        & ((yp < WinH - 1) | y_hi)
                    )
                    okf = ok.astype(jnp.float32)
                    wp = wb[c : c + 1, :] * okf
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(ioW - xp))  # (WinW,NQ)
                    hy0 = jnp.maximum(0.0, 1.0 - jnp.abs(ioH - yp))  # (WinH,NQ)
                    # ONE-SIDED hat derivatives matching grid_sample's
                    # floor-based lerp AD (the oracle's and the reference
                    # CUDA backward's convention): with u = tap - cell, the
                    # corner weight's derivative is -1 on u in [0, 1) and
                    # +1 on [-1, 0).  The round-4 form sign(cell - tap)
                    # gated on hat > 0 agreed everywhere EXCEPT taps
                    # sitting exactly on a grid line (u = 0: sign gives 0,
                    # and the u = -1 neighbor is dropped by the open gate)
                    # — which real inputs hit (init offsets are integer px;
                    # f32 coordinate math lands on integers), measured as a
                    # deterministic 0.197-rel grad_coords error on chip
                    # (round-5 session 2 gcdbg: got 0.0, want v_{t+1}-v_t).
                    ux = xp - ioW  # (WinW, NQ)
                    uy = yp - ioH  # (WinH, NQ)
                    dhx = jnp.where(
                        (ux >= -1.0) & (ux < 1.0),
                        jnp.where(ux >= 0.0, -1.0, 1.0), 0.0,
                    )
                    dhy = jnp.where(
                        (uy >= -1.0) & (uy < 1.0),
                        jnp.where(uy >= 0.0, -1.0, 1.0), 0.0,
                    )
                    taps.append((c, okf, wp, hx, hy0, dhx, dhy))
                # ...then the full-plane work, CHUNKED on the window's y
                # axis like the forward (same scoped-vmem stack rationale:
                # Mosaic keeps many pipelined product planes live; bounding
                # the plane size bounds the stack).  A and Ap row-partition
                # across chunks; dw/dy/dx accumulate their partial sums.
                # lane padding: see the forward's ch_rows (NQ<128 tiles)
                ch_rows = max(1, _CHUNK_BYTES // (WinW * max(NQ, 128) * 4))
                acc_tap = {t[0]: None for t in taps}  # c -> (dw, dy, dx)
                gv_parts = []
                for c0 in range(0, WinH, ch_rows):
                    ch = min(ch_rows, WinH - c0)
                    M3c = M3[c0 : c0 + ch]
                    S3c = jnp.zeros((ch, WinW, NQ), jnp.float32)
                    for c, okf, wp, hx, hy0, dhx, dhy in taps:
                        hy0c = hy0[c0 : c0 + ch]
                        dhyc = dhy[c0 : c0 + ch]
                        S3c = S3c + (wp * hy0c)[:, None, :] * hx[None, :, :]
                        A = jnp.sum(M3c * hx[None, :, :], axis=1)  # (ch, NQ)
                        Ap = jnp.sum(M3c * dhx[None, :, :], axis=1)
                        dw = jnp.sum(hy0c * A, axis=0, keepdims=True)
                        dy = wp * jnp.sum(dhyc * A, axis=0, keepdims=True)
                        dx = wp * jnp.sum(hy0c * Ap, axis=0, keepdims=True)
                        prev = acc_tap[c]
                        acc_tap[c] = (
                            (dw, dy, dx) if prev is None
                            else (prev[0] + dw, prev[1] + dy, prev[2] + dx)
                        )
                    gv_parts.append(jax.lax.dot_general(
                        S3c.reshape(ch * WinW, NQ).astype(mdt),
                        g_h.astype(mdt),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ))  # (ch*WinW, d)
                for c, okf, wp, hx, hy0, dhx, dhy in taps:
                    dw, dy, dx = acc_tap[c]
                    grow_w[c] = okf * dw
                    grow_y[c] = dy * Ht
                    grow_x[c] = dx * Wt
                gv = (
                    gv_parts[0] if len(gv_parts) == 1
                    else jnp.concatenate(gv_parts, axis=0)
                )
                gvs.append(gv)
            gcat = jnp.concatenate(gvs, axis=1)  # (cells, h*d)
            if HD != h * d:
                gcat = jnp.pad(gcat, ((0, 0), (0, HD - h * d)))
            gslabs[lt][:] = (
                gslabs[lt][:].reshape(cells, HD) + gcat
            ).reshape(WinH, WinW, HD)
            wc = pltpu.make_async_copy(
                gslabs[lt],
                gv_out[lt].at[b, pl.ds(wy0, WinH), pl.ds(wx0, WinW), :],
                sems.at[2 * n_lv + lt],
            )
            wc.start()
            write_copies.append(wc)

        gcb = jnp.concatenate(
            [grow_x[c] for c in range(HLP)]
            + [grow_y[c] for c in range(HLP)]
            + [grow_w[c] for c in range(HLP)]
            + [jnp.zeros((C - 3 * HLP, NQ), jnp.float32)],
            axis=0,
        )  # (C, NQ)
        gcpk_ref[0] = gcb.T.reshape(th, tw, C)

        # every RMW write must land before the NEXT grid cell reads an
        # overlapping window (the grid is sequential; awaiting here orders
        # cell i's writes before cell i+1's manual reads)
        for wc in write_copies:
            wc.wait()

    grid = (bs, nty, ntx)
    out_shapes = [
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in gval_lvls
    ] + [jax.ShapeDtypeStruct((bs, nty * th, ntx * tw, C), jnp.float32)]
    in_specs = [
        pl.BlockSpec((1, th, tw, C), lambda b, i, j: (b, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, tw, HD), lambda b, i, j: (b, i, j, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * (2 * n_lv)
    out_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * n_lv + [
        pl.BlockSpec((1, th, tw, C), lambda b, i, j: (b, i, j, 0),
                     memory_space=pltpu.VMEM)
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((wh, ww, HD), vdtype) for wh, ww in win]
        + [pltpu.VMEM((wh, ww, HD), jnp.float32) for wh, ww in win]
        + [pltpu.SemaphoreType.DMA((3 * n_lv,))],
        input_output_aliases={2 + n_lv + i: i for i in range(n_lv)},
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(cpk_lq, g_lq, *value_lvls, *gval_lvls)
    gval_out = list(outs[:n_lv])
    gcpk = outs[n_lv]
    return gval_out, gcpk


def msda_win_qm_packed_bwd(
    value: jax.Array,  # (bs, K, h, d)
    spatial_shapes: Shapes,
    cpk: jax.Array,  # (bs, K, C) packed q-major coords
    g: jax.Array,  # (bs, K, h*d) upstream gradient
    num_points: int,
    radius: int = 5,
    interpret: bool = False,
):
    """All-levels windowed MSDA backward: returns ``(g_value, g_cpk)`` for
    the ENVELOPE-MASKED part of the op (out-of-envelope taps carry zero
    gradient here; coarse oracle-routed levels are handled by the caller's
    correction-tier VJP as well).

    Mirrors msda_win_qm_packed's structure: per-level kernels chained
    through donated f32 grad_value accumulators."""
    from codetr_tpu.ops.msda_win import _build_value_lvls, _tile_shape_for_level

    bs, K, h, d = value.shape
    L = len(spatial_shapes)
    HLP = h * L * num_points
    C = cpk.shape[-1]
    HD = h * d
    value_lvls, HD_pad, lvl_start = _build_value_lvls(value, spatial_shapes, interpret)
    gval_lvls = [jnp.zeros(a.shape, jnp.float32) for a in value_lvls]

    g = g.astype(jnp.float32)
    if HD_pad != HD:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, HD_pad - HD)))

    gcpk_parts = []
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        s, e = int(lvl_start[lq]), int(lvl_start[lq + 1])
        th, tw = _tile_shape_for_level(lq, L)
        Kq = Hq * Wq
        if th * tw < 16:
            # coarse levels route through the exact gather in the forward;
            # their gradient is added by the caller's correction-tier VJP
            gcpk_parts.append(jnp.zeros((bs, Kq, C), jnp.float32))
            continue
        nty, ntx = -(-Hq // th), -(-Wq // tw)
        pad_y, pad_x = nty * th - Hq, ntx * tw - Wq
        cl = jax.lax.slice_in_dim(cpk, s, e, axis=1).reshape(bs, Hq, Wq, C)
        gl = jax.lax.slice_in_dim(g, s, e, axis=1).reshape(bs, Hq, Wq, HD_pad)
        if pad_y or pad_x:
            cl = jnp.pad(cl, ((0, 0), (0, pad_y), (0, pad_x), (0, 0)))
            gl = jnp.pad(gl, ((0, 0), (0, pad_y), (0, pad_x), (0, 0)))
        gval_lvls, gcpk_l = msda_win_lq_packed_bwd(
            value_lvls, gval_lvls, cl, gl, lq=lq,
            spatial_shapes=spatial_shapes, radius=radius, num_heads=h,
            head_dim=d, num_points=num_points, interpret=interpret,
        )
        gcpk_l = gcpk_l[:, :Hq, :Wq].reshape(bs, Kq, C)
        gcpk_parts.append(gcpk_l)
    gcpk = jnp.concatenate(gcpk_parts, axis=1)  # (bs, K, C)

    # fold the per-level padded grad slabs back to (bs, K, h, d)
    parts = []
    for i, (Ht, Wt) in enumerate(spatial_shapes):
        gl = gval_lvls[i][:, :, :Wt, :HD]  # strip W8 + lane padding
        parts.append(gl.reshape(bs, Ht * Wt, h, d))
    g_value = jnp.concatenate(parts, axis=1).astype(value.dtype)
    return g_value, gcpk
