#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line with the headline metric.

Headline: p50-equivalent device latency (ms/image) for Co-DINO Swin-L at the
configured resolution, measured as the mean of an on-device loop (host
per-dispatch timing is dominated by the remote-transport overhead, ~35 ms).

Baseline for vs_baseline: the reference's TensorRT FP16 latency on RTX 4090
at the same resolution (BASELINE.md): 1920x1280 -> 79.5 ms, 1152x768 -> 30.2,
608x608 -> 13.4.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TRT_BASELINE_MS = {(1920, 1280): 79.5, (1152, 768): 30.2, (608, 608): 13.4}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=608)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--msda-impl", default="auto")
    ap.add_argument("--no-split", action="store_true",
                    help="compile one monolithic executable (default: split "
                    "backbone|head — the monolithic Swin-L graph exceeds the "
                    "remote AOT transport limits)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from codetr_tpu.config import co_dino_swin_l
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.runtime.aot import benchmark, compile_forward

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params = build_codetr(
        co_dino_swin_l(),
        dtype=dtype,
        msda_impl=args.msda_impl,
        input_shape=(args.height, args.width),
    )
    fn, example = compile_forward(
        model, params, height=args.height, width=args.width, dtype=dtype,
        split=not args.no_split,
    )
    stats = benchmark(fn, example, iterations=args.iterations)

    base = TRT_BASELINE_MS.get((args.width, args.height))
    value = stats["device_ms_per_iter"]
    result = {
        "metric": f"swin-l {args.width}x{args.height} {args.dtype} device latency",
        "value": round(value, 2),
        "unit": "ms/image",
        "vs_baseline": round(base / value, 3) if base else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
