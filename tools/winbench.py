#!/usr/bin/env python
"""Per-query-level microbenchmark for the windowed MSDA encoder kernel.

Times ONE ``msda_win_lq_packed`` call per query level at encoder shapes
(init-like coordinates: grid anchors + jitter inside the envelope, so the
correction never fires), with an interleaved 900q canary tagging each
measurement with the chip's health at that moment (ROUND3_NOTES.md: the
time-sharing is bursty; only canary-sane rounds are raw evidence).

Variant knobs (round-4 optimization levers, VERDICT item 1):
  --radius N          window halo (model default 5)
  --tiles lq=th,tw    override _tile_shape_for_level per query level
  --dot-mode dq|qd    MXU dot orientation
  --debug-stage S     MSDA_WIN_DEBUG attribution stage (nodot/nosplat/minimal)

Usage: python tools/winbench.py --height 1920 --width 1280 --lq 0 1 2
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1920)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--lq", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--radius", type=int, default=5)
    ap.add_argument("--jitter", type=float, default=None,
                    help="px jitter around the grid anchor (default radius-1)")
    ap.add_argument("--tiles", nargs="*", default=[],
                    help="per-lq tile overrides, e.g. 2=8,16")
    ap.add_argument("--dot-mode", default="dq",
                choices=["dq", "qd", "dqp", "stack", "dh4"])
    ap.add_argument("--debug-stage", default="",
                    help="MSDA_WIN_DEBUG value (set before kernel import)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--full", action="store_true",
                    help="also time the all-levels production entry "
                    "msda_win_qm_packed")
    ap.add_argument("--module", action="store_true",
                    help="also time the full MSDA flax module (projections "
                    "+ coordinate pipeline + dispatch + out proj)")
    ap.add_argument("--verify", action="store_true",
                    help="compare each variant call against the flat-gather "
                    "oracle before timing")
    args = ap.parse_args()

    if args.debug_stage:
        os.environ["MSDA_WIN_DEBUG"] = args.debug_stage

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_canary_timer
    from codetr_tpu.ops import msda_win
    from codetr_tpu.ops.msda import msda_reference_qm
    from codetr_tpu.ops.msda_grid import _anchor
    from codetr_tpu.ops.msda_win import (
        _build_value_lvls,
        msda_win_lq_packed,
        pack_coords_qmajor,
    )

    overrides = {}
    for spec in args.tiles:
        k, v = spec.split("=")
        overrides[int(k)] = tuple(int(t) for t in v.split(","))
    if overrides:
        orig = msda_win._tile_shape_for_level

        def patched(lq, num_levels):
            return overrides.get(lq, orig(lq, num_levels))

        msda_win._tile_shape_for_level = patched

    H, W = args.height, args.width
    strides = (4, 8, 16, 32, 64)
    shapes = tuple((-(-H // s), -(-W // s)) for s in strides)
    K = sum(hh * ww for hh, ww in shapes)
    h, P, L, d = 8, 4, len(shapes), 32
    jit_px = args.jitter if args.jitter is not None else args.radius - 1.0

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((1, K, h, d)), jnp.bfloat16)
    x = np.zeros((1, h, L, P, K), np.float32)
    y = np.zeros_like(x)
    q0 = 0
    for lq, (Hq, Wq) in enumerate(shapes):
        iy, ix = np.meshgrid(np.arange(Hq), np.arange(Wq), indexing="ij")
        for lt, (Ht, Wt) in enumerate(shapes):
            ay = _anchor(iy, Hq, Ht).reshape(-1)
            ax = _anchor(ix, Wq, Wt).reshape(-1)
            y[0, :, lt, :, q0:q0 + Hq * Wq] = (
                ay + rng.uniform(-jit_px, jit_px, (h, P, Hq * Wq)) + 0.5
            ) / Ht
            x[0, :, lt, :, q0:q0 + Hq * Wq] = (
                ax + rng.uniform(-jit_px, jit_px, (h, P, Hq * Wq)) + 0.5
            ) / Wt
        q0 += Hq * Wq
    w = rng.uniform(0, 1, (1, h, L, P, K)).astype(np.float32)
    w /= w.sum(axis=(2, 3), keepdims=True)
    xj, yj, wj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)
    cpk = pack_coords_qmajor(xj, yj, wj)

    lvl_start = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in shapes])])

    canary = make_canary_timer()
    canary()

    def time_fn(fn, fargs, name):
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0])  # compile + sync

        def loop(n, *a):
            def body(i, c):
                v0 = a[0] + (c * jnp.float32(1e-30)).astype(a[0].dtype)
                o = fn(v0, *a[1:])
                return c + jnp.sum(
                    jax.tree.leaves(o)[0].astype(jnp.float32)
                ) * 1e-12

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        lo = jax.jit(loop, static_argnums=0)
        # warm the SAME static n the timed calls use (n is a static arg:
        # a different n is a different compile)
        np.asarray(lo(args.iters, *fargs))
        best = None
        for t in range(args.trials):
            c = canary()
            t0 = time.perf_counter()
            np.asarray(lo(args.iters, *fargs))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            rec = {"name": name, "ms": round(ms, 2), "canary_ms": round(c, 1)}
            print(json.dumps(rec), flush=True)
            # sane = canary within ~2.5x of the 3.3 ms healthy reference
            if c <= 8.2 and (best is None or ms < best):
                best = ms
        return best

    geo = {}
    for lq in args.lq:
        (th, tw), win = msda_win._win_geometry(lq, shapes, args.radius)
        geo[lq] = {"tile": [th, tw], "win": [list(wn) for wn in win],
                   "cells": [int(a * b) for a, b in win]}
    print(json.dumps({"geometry": geo, "radius": args.radius,
                      "dot_mode": args.dot_mode,
                      "debug": args.debug_stage or None}), flush=True)

    for lq in args.lq:
        Hq, Wq = shapes[lq]
        th, tw = msda_win._tile_shape_for_level(lq, L)
        s_, e_ = int(lvl_start[lq]), int(lvl_start[lq + 1])
        if th * tw < 16:
            # time the production coarse fallback for this level
            from codetr_tpu.ops.msda_win import _COARSE_IMPL, _coarse_fallback

            xl, yl, wl = xj[..., s_:e_], yj[..., s_:e_], wj[..., s_:e_]
            best = time_fn(
                jax.jit(lambda v, a, b, c: _coarse_fallback(v, shapes, a, b, c)),
                (value, xl, yl, wl), f"lq{lq}-{_COARSE_IMPL}",
            )
            print(json.dumps({"lq": lq, "coarse_impl": _COARSE_IMPL,
                              "coarse_best_sane_ms": best}), flush=True)
            continue
        s, e = int(lvl_start[lq]), int(lvl_start[lq + 1])
        cl = jax.lax.slice_in_dim(cpk, s, e, axis=1).reshape(1, Hq, Wq, cpk.shape[-1])

        def call(v, c):
            value_lvls, HD_pad, _ = _build_value_lvls(v, shapes, False)
            o, n = msda_win_lq_packed(
                value_lvls, c, lq=lq, spatial_shapes=shapes,
                radius=args.radius, num_heads=h, head_dim=d, num_points=P,
                dot_mode=args.dot_mode,
            )
            return o, n

        if args.verify:
            o, n = jax.jit(call)(value, cl)
            xl = xj[..., s:e]
            yl = yj[..., s:e]
            wl = wj[..., s:e]
            want = msda_reference_qm(value, shapes, xl, yl, wl)
            err = float(jnp.abs(o[..., : h * d].astype(jnp.float32)
                                - want.astype(jnp.float32)).max())
            print(json.dumps({"lq": lq, "verify_max_err": round(err, 5),
                              "n_out": float(n)}), flush=True)

        best = time_fn(jax.jit(call), (value, cl), f"lq{lq}")
        print(json.dumps({"lq": lq, "best_sane_ms": best}), flush=True)

    if args.full:
        from codetr_tpu.ops.msda_win import msda_win_qm_packed

        def full_call(v, c):
            return msda_win_qm_packed(
                v, shapes, c, P, radius=args.radius, dot_mode=args.dot_mode
            )

        best = time_fn(jax.jit(full_call), (value, cpk), "full")
        print(json.dumps({"full_best_sane_ms": best}), flush=True)

    if args.module:
        # the FULL MSDA flax module (value/offset/attn projections +
        # q-major coordinate pipeline + production dispatch + out proj):
        # module-minus-kernel = the per-call glue cost outside the kernel
        import flax.linen as nn

        from codetr_tpu.config import MSDAConfig
        from codetr_tpu.models.msda_module import MultiScaleDeformableAttention

        cfg = MSDAConfig(embed_dims=256, num_heads=h, num_levels=L, num_points=P)
        mod = MultiScaleDeformableAttention(
            cfg=cfg, dtype=jnp.bfloat16, impl="auto", grid_queries=True,
        )
        ref_np = np.zeros((1, K, L, 2), np.float32)
        q0 = 0
        for lq, (Hq, Wq) in enumerate(shapes):
            iy, ix = np.meshgrid(np.arange(Hq), np.arange(Wq), indexing="ij")
            ref_np[0, q0:q0 + Hq * Wq, :, 0] = ((ix + 0.5) / Wq).reshape(-1)[:, None]
            ref_np[0, q0:q0 + Hq * Wq, :, 1] = ((iy + 0.5) / Hq).reshape(-1)[:, None]
            q0 += Hq * Wq
        ref = jnp.asarray(ref_np)
        query = jnp.asarray(rng.standard_normal((1, K, 256)) * 0.02, jnp.bfloat16)
        # no jit: spatial_shapes must stay a static python tuple
        params = mod.init(
            jax.random.PRNGKey(0), query, None, None, None, None, ref, shapes
        )

        def module_call(q, r):
            return mod.apply(params, q, None, None, None, None, r, shapes)

        best = time_fn(jax.jit(module_call), (query, ref), "module")
        print(json.dumps({"module_best_sane_ms": best}), flush=True)


if __name__ == "__main__":
    main()
