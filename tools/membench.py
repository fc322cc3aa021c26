#!/usr/bin/env python
"""HBM-bound op microbenchmarks at encoder activation shapes (round 4).

The @1920 attribution (tools/encattr.py) shows ln/vp/outp running 5-10x
over the naive 819 GB/s HBM floor while ffn sits AT the compute floor.
This tool separates "the chip's memory system is time-share-dilated" from
"XLA emits a multi-pass LayerNorm": it measures the pure elementwise
ceiling (bf16 scale = 210 MB traffic at (1, 204600, 256)) and then each
LN candidate against it, all canary-tagged.

Stages:
  scale     x * 1.0000001 bf16 — the memcpy-class ceiling
  scalef32  f32 in/out scale (420 MB traffic)
  lnflax    nn.LayerNorm(dtype=bf16, param_dtype=f32)  — the model's op
  lnhand    handwritten 2-pass fused LN, f32 accum, bf16 in/out
  lnaffine  lnhand + learned scale/bias (the full model semantics)
  dense     Dense 256->256 bf16 (the vp/outp shape)
  add       residual add bf16 (315 MB traffic)

Usage: python tools/membench.py [--height 1920 --width 1280]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--only", nargs="*", default=[])
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_canary_timer

    H, W = args.height, args.width
    strides = (4, 8, 16, 32, 64)
    K = sum((-(-H // s)) * (-(-W // s)) for s in strides)
    C = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, K, C)), jnp.bfloat16)
    xf = x.astype(jnp.float32)

    canary = make_canary_timer()
    canary()

    def time_fn(fn, fargs, name, traffic_mb):
        out = fn(*fargs)
        np.asarray(jax.tree.leaves(out)[0])

        def loop(n, *a):
            def body(i, c):
                a0 = a[0] + (c * jnp.float32(1e-30)).astype(a[0].dtype)
                o = fn(a0, *a[1:])
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
            print(json.dumps({"name": name, "ms": round(ms, 3),
                              "canary_ms": round(c, 1)}), flush=True)
            if c <= 8.2 and (best is None or ms < best):
                best = ms
        gbs = traffic_mb / 1e3 / (best / 1e3) if best else None
        print(json.dumps({"stage": name, "best_sane_ms": best,
                          "eff_gb_s": round(gbs, 1) if gbs else None}),
              flush=True)
        return best

    want = lambda n: (not args.only) or n in args.only
    mb_bf16 = K * C * 2 / 1e6  # one pass
    results = {}

    if want("scale"):
        results["scale"] = time_fn(
            jax.jit(lambda t: t * jnp.bfloat16(1.0000001)), (x,),
            "scale", 2 * mb_bf16)
    if want("scalef32"):
        results["scalef32"] = time_fn(
            jax.jit(lambda t: t * jnp.float32(1.0000001)), (xf,),
            "scalef32", 4 * mb_bf16)
    if want("lnflax"):
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16,
                          param_dtype=jnp.float32)
        p = ln.init(jax.random.PRNGKey(0), x)
        results["lnflax"] = time_fn(
            jax.jit(lambda t: ln.apply(p, t)), (x,), "lnflax", 2 * mb_bf16)
    if want("lnhand"):
        def lnhand(t):
            tf = t.astype(jnp.float32)
            m = jnp.mean(tf, -1, keepdims=True)
            v = jnp.mean(jnp.square(tf), -1, keepdims=True) - jnp.square(m)
            return ((tf - m) * jax.lax.rsqrt(v + 1e-5)).astype(jnp.bfloat16)

        results["lnhand"] = time_fn(
            jax.jit(lnhand), (x,), "lnhand", 2 * mb_bf16)
    if want("lnaffine"):
        g = jnp.asarray(rng.standard_normal(C), jnp.float32)
        b = jnp.asarray(rng.standard_normal(C), jnp.float32)

        def lnaff(t, gg, bb):
            tf = t.astype(jnp.float32)
            m = jnp.mean(tf, -1, keepdims=True)
            v = jnp.mean(jnp.square(tf), -1, keepdims=True) - jnp.square(m)
            return ((tf - m) * (jax.lax.rsqrt(v + 1e-5) * gg) + bb).astype(
                jnp.bfloat16)

        results["lnaffine"] = time_fn(
            jax.jit(lnaff), (x, g, b), "lnaffine", 2 * mb_bf16)
    if want("dense"):
        dn = nn.Dense(C, dtype=jnp.bfloat16, param_dtype=jnp.float32)
        pd = dn.init(jax.random.PRNGKey(1), x)
        results["dense"] = time_fn(
            jax.jit(lambda t: dn.apply(pd, t)), (x,), "dense", 2 * mb_bf16)
    if want("add"):
        results["add"] = time_fn(
            jax.jit(lambda t, u: t + u), (x, x), "add", 3 * mb_bf16)

    print(json.dumps({"K": K, "summary_best_sane_ms": results}), flush=True)


if __name__ == "__main__":
    main()
