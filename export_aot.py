#!/usr/bin/env python
"""Export CLI — the TPU analog of the reference's export.py.

Workflow (mirrors export.py:225-334): build model (+ optional .pth weights)
-> preprocess demo image -> run eager-jit baseline + visualize -> AOT-compile
at fixed (height, width) -> serialize the executable (the ".engine" analog)
-> reload + compare + benchmark.

Example:
  python export_aot.py --dtype bfloat16 --height 608 --width 608 \
      --image assets/demo.jpg --output out/
"""

import argparse
import json
import os
import sys

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    # CLI knobs mirror export.py:20-94
    ap = argparse.ArgumentParser(description="Export Co-DINO to a serialized XLA executable")
    ap.add_argument("--config", default="swin-l", choices=["swin-l", "r50", "tiny"],
                    help="model preset (or use --config-file)")
    ap.add_argument("--config-file", default=None, help="python config file (mmengine-style)")
    ap.add_argument("--weights", default=None, help="mmdet .pth checkpoint")
    ap.add_argument("--image", default=None, help="test image for validation/visualization")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--output", default="codetr_tpu_export")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--score-threshold", type=float, default=0.0)  # test_cfg score_thr
    ap.add_argument("--iou-threshold", type=float, default=0.8)  # test_cfg[0].nms iou
    ap.add_argument("--msda-impl", default="auto")
    ap.add_argument("--fuse-preprocess", action="store_true",
                    help="serialize the fused-serving form: the executable "
                    "accepts (uint8 canvas, (th,tw) int32) and runs "
                    "normalize+pad+mask inside the graph (the reference "
                    "must preprocess on host before TRT, export.py:110-129)")
    ap.add_argument("--skip-benchmark", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp
    import numpy as np

    from codetr_tpu.config import co_dino_r50, co_dino_swin_l, tiny_test_config
    from codetr_tpu.inferencer import Inferencer
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.runtime.aot import benchmark, compile_forward, load_executable, save_executable

    os.makedirs(args.output, exist_ok=True)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.config_file:
        from codetr_tpu.utils.config_loader import load_config_file

        cfg = load_config_file(args.config_file)
    else:
        cfg = {"swin-l": co_dino_swin_l, "r50": co_dino_r50, "tiny": tiny_test_config}[args.config]()

    print(f"building {args.config} ({args.dtype}) at {args.width}x{args.height} ...")
    model, params = build_codetr(
        cfg, args.weights, dtype=dtype, msda_impl=args.msda_impl,
        input_shape=(args.height, args.width), batch_size=args.batch_size,
    )
    fn, example = compile_forward(
        model, params, height=args.height, width=args.width,
        batch_size=args.batch_size, dtype=dtype,
        fuse_preprocess=args.fuse_preprocess, preprocess_cfg=cfg.preprocess,
    )

    # serialized-executable path (engine save/load analog, export.py:320-334).
    # Weights ship as a companion blob + module ARGUMENT: baked-constant
    # modules (~900MB for Swin-L) exceed the remote AOT compile transport.
    exe_path = os.path.join(args.output, "codetr.codetr.xla")
    export_fn = (
        fn.fused_apply if args.fuse_preprocess
        else (lambda p, x, m: model.apply(p, x, m))
    )
    save_executable(
        exe_path, export_fn, example, params=params,
        meta={
            "config": args.config, "dtype": args.dtype,
            "height": args.height, "width": args.width,
            "batch_size": args.batch_size,
            "fused_preprocess": args.fuse_preprocess,
        })
    print(f"saved executable: {exe_path} ({os.path.getsize(exe_path)/1e6:.1f} MB)")

    loaded = load_executable(exe_path)
    out_direct = fn(*example)
    out_loaded = loaded(*example)
    drift = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                for a, b in zip(out_direct, out_loaded))
    print(f"reload drift vs direct: {drift:.2e}")

    if args.image:
        import cv2

        img_bgr = cv2.imread(args.image)
        assert img_bgr is not None, f"cannot read {args.image}"
        img = img_bgr[..., ::-1]
        inf = Inferencer(
            model, params, cfg, height=args.height, width=args.width,
            score_threshold=args.score_threshold, iou_threshold=args.iou_threshold,
            compiled_fn=loaded, input_dtype=dtype,
            device_preprocess=args.fuse_preprocess,
        )
        dets = inf([img])
        n = int(dets[0].keep.sum())
        print(f"detections above threshold: {n}")
        inf.visualize(img, dets[0], os.path.join(args.output, "vis.jpg"))
        inf.dump_json(dets, os.path.join(args.output, "predictions.json"))

    if not args.skip_benchmark:
        stats = benchmark(loaded, example, iterations=args.iterations)
        print(json.dumps(stats))
        with open(os.path.join(args.output, "benchmark.json"), "w") as f:
            json.dump(stats, f, indent=2)


if __name__ == "__main__":
    main()
