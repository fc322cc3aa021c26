#!/usr/bin/env python
"""On-chip train-step timing + production-VJP gradcheck (round-4 item 4).

Done-criterion from the round-3 VERDICT: train step @608 bf16 measured on
the real chip with backward <= 3x forward, and the production packed VJP
(fused windowed backward, ops/msda_win_bwd.py) matching the oracle AD on
chip (the CPU interpret-mode gradchecks already pass in tests/).

Times, canary-tagged (only canary-sane trials are raw evidence):
  fwd        model.train_outputs + dino_detection_loss, value only
  fwd+bwd    jax.value_and_grad of the same loss
  step       full optax train step (adamw) incl. param update

Usage: python tools/trainbench.py [--height 608 --width 608] [--gradcheck]
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
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--width", type=int, default=608)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--gradcheck", action="store_true",
                    help="on-chip production-packed-VJP vs oracle-AD check "
                    "before timing")
    ap.add_argument("--gradcheck-only", action="store_true",
                    help="exit after the gradcheck (skip the timing stages)")
    ap.add_argument("--gradcheck-hw", type=int, default=320,
                    help="square resolution for the gradcheck's encoder "
                    "shapes (the flat-gather oracle's AD materializes "
                    "4 rows/tap — at 608 that exhausts HBM; 320 keeps the "
                    "same Mosaic lowering at ~1/4 the taps)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import make_canary_timer
    from codetr_tpu.config import co_dino_swin_l
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.parallel.losses import dino_detection_loss

    H, W = args.height, args.width

    if args.gradcheck:
        # production packed dispatch VJP vs oracle AD, on the REAL chip
        # (tests/test_msda_win_bwd.py proves the same in interpret mode;
        # this proves the Mosaic lowering)
        from codetr_tpu.ops.msda import msda_grid_packed, msda_reference_qm
        from codetr_tpu.ops.msda_win import (
            pack_coords_qmajor,
            unpack_coords_qmajor,
        )

        strides = (4, 8, 16, 32, 64)
        GH = GW = args.gradcheck_hw
        shapes = tuple((-(-GH // s), -(-GW // s)) for s in strides)
        K = sum(hh * ww for hh, ww in shapes)
        h, P, d, L = 8, 4, 32, len(shapes)
        rng = np.random.default_rng(0)
        from codetr_tpu.ops.msda_grid import _anchor

        x = np.zeros((1, h, L, P, K), np.float32)
        y = np.zeros_like(x)
        q0 = 0
        for lq, (Hq, Wq) in enumerate(shapes):
            iy, ix = np.meshgrid(np.arange(Hq), np.arange(Wq), indexing="ij")
            for lt, (Ht, Wt) in enumerate(shapes):
                ay = _anchor(iy, Hq, Ht).reshape(-1)
                ax = _anchor(ix, Wq, Wt).reshape(-1)
                y[0, :, lt, :, q0:q0 + Hq * Wq] = (
                    ay + rng.uniform(-3, 3, (h, P, Hq * Wq)) + 0.5) / Ht
                x[0, :, lt, :, q0:q0 + Hq * Wq] = (
                    ax + rng.uniform(-3, 3, (h, P, Hq * Wq)) + 0.5) / Wt
            q0 += Hq * Wq
        w = rng.uniform(0, 1, (1, h, L, P, K)).astype(np.float32)
        w /= w.sum(axis=(2, 3), keepdims=True)
        xj, yj, wj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)
        value = jnp.asarray(rng.standard_normal((1, K, h, d)), jnp.float32)
        cpk = pack_coords_qmajor(xj, yj, wj)
        g = jnp.asarray(rng.standard_normal((1, K, h * d)), jnp.float32)

        def prod(v, c):
            return msda_grid_packed(v, shapes, c, P, impl="auto", radius=5,
                                    correction_budget=65536)

        def oracle(v, c):
            xx, yy, ww = unpack_coords_qmajor(c, h, L, P)
            return msda_reference_qm(v, shapes, xx, yy, ww)

        out_p, vjp_p = jax.vjp(jax.jit(prod), value, cpk)
        out_o, vjp_o = jax.vjp(jax.jit(oracle), value, cpk)
        err_out = float(jnp.abs(out_p - out_o).max())
        gv_p, gc_p = vjp_p(g)
        gv_o, gc_o = vjp_o(g)
        sv = float(jnp.abs(gv_o).max()) + 1e-9
        sc = float(jnp.abs(gc_o).max()) + 1e-9
        ev = float(jnp.abs(gv_p - gv_o).max()) / sv
        ec = float(jnp.abs(gc_p - gc_o).max()) / sc
        print(json.dumps({"gradcheck": {
            "resolution": [GH, GW],
            "spatial_shapes": [list(s) for s in shapes],
            "out_max_err": err_out, "grad_value_rel": ev,
            "grad_coords_rel": ec,
            "pass": bool(err_out < 2e-4 and ev < 1e-4 and ec < 1e-4),
        }}), flush=True)
        if args.gradcheck_only:
            return

    dtype = jnp.bfloat16
    model, params = build_codetr(
        co_dino_swin_l(), dtype=dtype, msda_impl="auto", input_shape=(H, W)
    )
    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.1, dtype)
    mask = jnp.zeros((1, H, W), jnp.float32)
    max_gt = 32
    gt_boxes = jnp.asarray(
        np.clip(rng.uniform(0.1, 0.9, (1, max_gt, 4)), 0.05, 0.3), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(0, 80, (1, max_gt)), jnp.int32)
    gt_valid = jnp.asarray(np.arange(max_gt)[None] < 7)

    def loss_fn(p, xi, m):
        out = model.apply(p, xi, m, method=model.train_outputs)
        total, _ = dino_detection_loss(out, gt_boxes, gt_labels, gt_valid)
        return total

    canary = make_canary_timer()
    canary()

    def time_fn(fn, fargs, name):
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0])

        def loop(n, *a):
            def body(i, c):
                a1 = jax.tree.map(
                    lambda t: t + (c * jnp.float32(1e-30)).astype(t.dtype),
                    a[1])
                o = fn(a[0], a1, *a[2:])
                acc = c
                for leaf in jax.tree.leaves(o):
                    acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
                return acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        lo = jax.jit(loop, static_argnums=0)
        np.asarray(lo(args.iters, *fargs))
        best = None
        for _ in range(args.trials):
            c = canary()
            t0 = time.perf_counter()
            np.asarray(lo(args.iters, *fargs))
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(json.dumps({"name": name, "ms": round(ms, 2),
                              "canary_ms": round(c, 1)}), flush=True)
            if c <= 8.2 and (best is None or ms < best):
                best = ms
        print(json.dumps({"stage": name, "best_sane_ms": best}), flush=True)
        return best

    fwd = time_fn(jax.jit(loss_fn), (params, xin, mask), "fwd")
    vg = jax.jit(jax.value_and_grad(loss_fn))
    fwdbwd = time_fn(vg, (params, xin, mask), "fwd+bwd")

    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def step(p, xi, m, os_):
        loss, grads = jax.value_and_grad(loss_fn)(p, xi, m)
        updates, os2 = tx.update(grads, os_, p)
        return optax.apply_updates(p, updates), os2, loss

    full = time_fn(jax.jit(step), (params, xin, mask, opt_state), "step")

    bwd = (fwdbwd - fwd) if (fwd and fwdbwd) else None
    print(json.dumps({
        "H": H, "W": W, "fwd_ms": fwd, "fwdbwd_ms": fwdbwd, "step_ms": full,
        "bwd_over_fwd": round(bwd / fwd, 2) if bwd else None,
    }), flush=True)


if __name__ == "__main__":
    main()
