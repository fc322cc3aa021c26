#!/usr/bin/env python
"""Swin backbone stage attribution @ flagship shapes (round-4 VERDICT item 5:
features() measured 33.9 ms vs a 13.9 ms FLOP floor — find the 2.4x).

Times, canary-tagged (bench.make_canary_timer):
  features     the full backbone+neck features() entry
  stage{i}     one SwinBlockPair at stage i's (H, W, C), x depths[i]/2
  wmsa{i}      one ShiftWindowMSA (shift=0) at stage i's shapes
  ffn{i}       one FFN at stage i's shapes
  part{i}      window_partition -> window_reverse roundtrip (pure relayout)
  roll{i}      jnp.roll +-shift roundtrip (the shifted block's extra cost)

Usage: python tools/swinattr.py [--height 1920 --width 1280] [--stages 0 1 2 3]
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
    ap.add_argument("--stages", type=int, nargs="*", default=[0, 1, 2, 3])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--skip-features", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_canary_timer
    from codetr_tpu.config import co_dino_swin_l
    from codetr_tpu.models import swin as swin_mod
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.models.swin import FFN, ShiftWindowMSA, SwinBlockPair

    H, W = args.height, args.width
    cfg = co_dino_swin_l()
    sc = cfg.swin
    dtype = jnp.bfloat16
    canary = make_canary_timer()
    canary()

    def time_fn(fn, fargs, name, scale=1.0):
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
            if c <= 8.2 and (best is None or ms < best):
                best = ms
        rec = {"stage": name, "best_sane_ms": None if best is None else round(best, 3)}
        if best is not None and scale != 1.0:
            rec["scaled_ms"] = round(best * scale, 2)
        print(json.dumps(rec), flush=True)
        return best

    rng = np.random.default_rng(0)

    if not args.skip_features:
        model, params = build_codetr(
            cfg, dtype=dtype, msda_impl="auto", input_shape=(H, W)
        )
        xin = jnp.asarray(rng.standard_normal((1, H, W, 3)) * 0.1, dtype)
        feat = jax.jit(
            lambda p, x: model.apply(p, x, method=model.features)
        )
        time_fn(lambda x, p: feat(p, x), (xin, params), "features")

    # per-stage shapes after patch embed (stride 4) and merges
    H0, W0 = -(-H // 4), -(-W // 4)
    dims = sc.embed_dims
    for i in range(4):
        Hs, Ws = H0 >> i, W0 >> i
        C = dims << i
        if i not in args.stages:
            continue
        x = jnp.asarray(rng.standard_normal((1, Hs, Ws, C)) * 0.1, dtype)

        pair = SwinBlockPair(
            embed_dims=C, num_heads=sc.num_heads[i],
            feedforward_channels=sc.mlp_ratio * C,
            window_size=sc.window_size, qkv_bias=sc.qkv_bias,
            qk_scale=sc.qk_scale, dtype=dtype,
        )
        p = pair.init(jax.random.PRNGKey(0), x)
        time_fn(
            lambda xx, pp: pair.apply(pp, xx)[0], (x, p),
            f"stage{i}-pair", scale=sc.depths[i] / 2,
        )

        msa = ShiftWindowMSA(
            embed_dims=C, num_heads=sc.num_heads[i], window_size=sc.window_size,
            shift_size=0, qkv_bias=sc.qkv_bias, qk_scale=sc.qk_scale,
            dtype=dtype,
        )
        pm = msa.init(jax.random.PRNGKey(0), x)
        time_fn(lambda xx, pp: msa.apply(pp, xx), (x, pm), f"wmsa{i}")

        ffn = FFN(
            feedforward_channels=sc.mlp_ratio * C, embed_dims=C,
            activation="gelu", add_identity=False, dtype=dtype,
        )
        xf = x.reshape(1, Hs * Ws, C)
        pf = ffn.init(jax.random.PRNGKey(0), xf)
        time_fn(lambda xx, pp: ffn.apply(pp, xx), (xf, pf), f"ffn{i}")

        ws = sc.window_size
        Hp = -(-Hs // ws) * ws
        Wp = -(-Ws // ws) * ws
        xp = jnp.asarray(rng.standard_normal((1, Hp, Wp, C)) * 0.1, dtype)

        def partrev(a):
            wnd = swin_mod.window_partition(a, ws)
            return swin_mod.window_reverse(wnd, ws, Hp, Wp)

        time_fn(partrev, (xp,), f"part{i}")

        def rollrt(a):
            b = jnp.roll(a, shift=(-6, -6), axis=(1, 2))
            return jnp.roll(b, shift=(6, 6), axis=(1, 2))

        time_fn(rollrt, (xp,), f"roll{i}")


if __name__ == "__main__":
    main()
