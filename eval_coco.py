#!/usr/bin/env python
"""COCO val evaluation CLI (BASELINE config 5: batched, padded static shapes).

Usage:
  python eval_coco.py --ann instances_val2017.json --img-dir val2017/ \
      --config swin-l --height 768 --width 1152 --dtype bfloat16 --batch-size 4
"""

import argparse
import json
import os
import sys

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True, help="COCO instances json")
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--config", default="swin-l", choices=["swin-l", "r50", "tiny"])
    ap.add_argument("--weights", default=None)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--score-threshold", type=float, default=0.0)
    ap.add_argument("--iou-threshold", type=float, default=0.8)
    ap.add_argument("--nms-type", default=None,
                    choices=[None, "nms", "soft_nms", "soft_nms_gaussian"],
                    help="default: the config's test_cfg NMS (soft_nms)")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--msda-impl", default="auto")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codetr_tpu.config import co_dino_r50, co_dino_swin_l, tiny_test_config
    from codetr_tpu.models.codetr import build_codetr
    from codetr_tpu.ops.nms import postprocess_detections
    from codetr_tpu.utils.coco_eval import evaluate_detections, load_coco_annotations
    from codetr_tpu.utils.preprocess import preprocess_numpy

    cfg = {"swin-l": co_dino_swin_l, "r50": co_dino_r50, "tiny": tiny_test_config}[args.config]()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params = build_codetr(
        cfg, args.weights, dtype=dtype, msda_impl=args.msda_impl,
        input_shape=(args.height, args.width), batch_size=args.batch_size,
    )
    fwd = jax.jit(lambda x, m: model.apply(params, x, m))
    nms_type = args.nms_type or cfg.head.nms_type
    post = jax.jit(
        lambda b, s, l, sf: postprocess_detections(
            b, s, l, score_threshold=args.score_threshold,
            iou_threshold=args.iou_threshold, scale_factor=None,
            nms_type=nms_type, nms_sigma=cfg.head.nms_sigma,
            nms_min_score=cfg.head.nms_min_score,
        )
    )

    images = load_coco_annotations(args.ann)
    ids = sorted(images)[: args.max_images]
    preds, gts = [], []
    bs = args.batch_size
    for i0 in range(0, len(ids), bs):
        chunk = ids[i0 : i0 + bs]
        batch_x = np.zeros((bs, args.height, args.width, 3), np.float32)
        batch_m = np.ones((bs, args.height, args.width), np.float32)
        sfs = []
        for j, img_id in enumerate(chunk):
            path = os.path.join(args.img_dir, images[img_id]["file_name"])
            img = cv2.imread(path)[..., ::-1]
            x, m, sf, _ = preprocess_numpy(img, args.height, args.width, cfg.preprocess)
            batch_x[j], batch_m[j] = x, m
            sfs.append(sf)
        boxes, scores, labels = fwd(jnp.asarray(batch_x), jnp.asarray(batch_m))
        b, s, l, keep = post(boxes, scores, labels, None)
        b, s, l, keep = map(np.asarray, (b, s, l, keep))
        for j, img_id in enumerate(chunk):
            k = keep[j]
            sx, sy = sfs[j]
            preds.append({
                "boxes": b[j][k] / np.array([sx, sy, sx, sy]),
                "scores": s[j][k],
                "labels": l[j][k],
            })
            gts.append(images[img_id])
        print(f"\r{min(i0 + bs, len(ids))}/{len(ids)}", end="", flush=True)
    print()
    metrics = evaluate_detections(preds, gts, cfg.head.num_classes)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
