"""End-to-end inference pipeline — the analog of the reference's
``Inferencer`` (codetr/inferencer.py:28-482) and the Python half of its C++
runtime (codetr_inference.cpp).

Pipeline per image (mirrors inferencer.py:404-478):
  preprocess (keep-ratio resize -> pad -> normalize -> pad mask)
  -> compiled forward (boxes, scores, labels at the padded resolution)
  -> postprocess (score threshold + per-class NMS + rescale to original)
  -> optional visualization + JSON-able dict output.

TPU-first notes: NMS runs *inside* jit-able code with static shapes
(codetr_tpu.ops.nms) — the reference must hoist it out of the compiled graph
(inferencer.py:383-386).  Postprocess here can therefore run fused with the
model on device; results come back as fixed-size arrays plus a keep mask.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codetr_tpu.config import CoDETRConfig
from codetr_tpu.ops.nms import postprocess_detections
from codetr_tpu.utils.coco import COCO_CLASSES
from codetr_tpu.utils.preprocess import preprocess_numpy


@dataclass
class Detections:
    """Fixed-size detection set; ``keep`` masks the valid rows."""

    boxes: np.ndarray  # (N, 4) xyxy in original-image pixels
    scores: np.ndarray  # (N,)
    labels: np.ndarray  # (N,)
    keep: np.ndarray  # (N,) bool

    def compact(self) -> "Detections":
        k = self.keep
        return Detections(self.boxes[k], self.scores[k], self.labels[k], np.ones(k.sum(), bool))

    def to_dict(self) -> dict:
        """JSON dict, reference pred2dict parity (inferencer.py:303-341)."""
        k = self.keep
        return {
            "labels": self.labels[k].tolist(),
            "scores": [float(s) for s in self.scores[k]],
            "bboxes": [[float(v) for v in b] for b in self.boxes[k]],
        }


class Inferencer:
    """Build-once serving driver: call with any number of images.

    Args mirror the reference CLI knobs (export.py:20-94): fixed (height,
    width), dtype policy, score/iou thresholds.  ``batch_size`` > 1 enables
    the batched serving mode (reference analog: pseudo_collate batching,
    codetr/inferencer.py:404-453): images are collated into fixed-size
    batches (the compiled graph has ONE static batch shape; short final
    batches are padded by repeating the last image and the padding results
    dropped), and all batches are dispatched asynchronously before any
    result is pulled — per-dispatch transport overhead pipelines away.
    Measured serving config: bs=4 at 1152x768 reaches TRT per-image parity
    (ROUND2_NOTES.md).
    """

    def __init__(
        self,
        model,
        params,
        cfg: CoDETRConfig,
        *,
        height: int,
        width: int,
        batch_size: int = 1,
        score_threshold: float | None = None,
        iou_threshold: float | None = None,
        nms_type: str | None = None,
        classes: Sequence[str] = COCO_CLASSES,
        compiled_fn=None,
        input_dtype=jnp.float32,
        device_preprocess: bool = False,
    ):
        self.cfg = cfg
        self.height = height
        self.width = width
        assert batch_size >= 1
        self.batch_size = batch_size
        # defaults come from test_cfg via the config (reference reads
        # test_cfg the same way, inferencer.py:62-71): score_thr 0, soft-NMS
        # iou 0.8; explicit arguments override.
        self.score_threshold = (
            cfg.head.score_threshold if score_threshold is None else score_threshold
        )
        self.iou_threshold = (
            cfg.head.nms_iou_threshold if iou_threshold is None else iou_threshold
        )
        self.nms_type = cfg.head.nms_type if nms_type is None else nms_type
        self.classes = list(classes)
        # serialized executables have FIXED input dtypes (engine semantics)
        self.input_dtype = input_dtype
        # fused-serving mode: the compiled graph starts with
        # preprocess_in_graph and takes (uint8 canvas, (th, tw)); the host
        # only cv2-resizes (utils/preprocess.resize_to_canvas).  A
        # compiled_fn passed in must have been built with
        # compile_forward(..., fuse_preprocess=True) / the matching export.
        self.device_preprocess = device_preprocess

        if compiled_fn is None:
            if device_preprocess:
                from codetr_tpu.utils.preprocess import preprocess_in_graph

                mean = tuple(cfg.preprocess.mean)
                std = tuple(cfg.preprocess.std)

                def fwd(canvas, thw):
                    x, m = preprocess_in_graph(canvas, thw, mean=mean, std=std)
                    return model.apply(params, x.astype(input_dtype), m)

            else:
                fwd = lambda inputs, masks: model.apply(params, inputs, masks)
            compiled_fn = jax.jit(fwd)
        self._fwd = compiled_fn

        self._post = jax.jit(
            lambda b, s, l, sf: postprocess_detections(
                b, s, l,
                score_threshold=self.score_threshold,
                iou_threshold=self.iou_threshold,
                scale_factor=sf,
                nms_type=self.nms_type,
                nms_sigma=cfg.head.nms_sigma,
                nms_min_score=cfg.head.nms_min_score,
            )
        )

    def __call__(self, images: Sequence[np.ndarray]) -> List[Detections]:
        """images: list of (H, W, 3) RGB uint8 arrays (any count)."""
        bs = self.batch_size
        if self.device_preprocess:
            from codetr_tpu.utils.preprocess import resize_to_canvas

            # host work is the cv2 resize only; normalize+pad+mask run
            # inside the compiled graph (3 uint8 bytes/px cross the PCIe
            # link instead of 12-16 float bytes)
            pre = [
                resize_to_canvas(im, self.height, self.width) for im in images
            ]
        else:
            pre = [
                preprocess_numpy(im, self.height, self.width, self.cfg.preprocess)
                for im in images
            ]
        # dispatch ALL batches asynchronously (jax dispatch is async; nothing
        # blocks until np.asarray below), then collect — the per-dispatch
        # host<->device overhead overlaps with device compute
        pending = []
        for i in range(0, len(pre), bs):
            chunk = pre[i : i + bs]
            n = len(chunk)
            chunk = chunk + [chunk[-1]] * (bs - n)  # pad by repeating
            if self.device_preprocess:
                canvas = np.stack([c[0] for c in chunk])
                thw = np.asarray([c[1] for c in chunk], np.int32)
                boxes, scores, labels = self._fwd(
                    jnp.asarray(canvas), jnp.asarray(thw)
                )
                sfs = [c[2] for c in chunk]
            else:
                inputs = np.stack([c[0] for c in chunk])
                masks = np.stack([c[1] for c in chunk])
                boxes, scores, labels = self._fwd(
                    jnp.asarray(inputs, self.input_dtype),
                    jnp.asarray(masks, jnp.float32),
                )
                sfs = [c[2] for c in chunk]
            sf = np.asarray(
                [[s[0], s[1], s[0], s[1]] for s in sfs], np.float32
            )[:, None, :]
            pending.append((n, self._post(boxes, scores, labels, jnp.asarray(sf))))

        outs = []
        for n, (b, s, l, keep) in pending:
            b, s, l, keep = (np.asarray(a) for a in (b, s, l, keep))
            for j in range(n):
                outs.append(Detections(b[j], s[j], l[j], keep[j]))
        return outs

    def dump_json(self, detections: Sequence[Detections], path: str):
        with open(path, "w") as f:
            json.dump([d.to_dict() for d in detections], f, indent=2)

    def visualize(self, image: np.ndarray, det: Detections, out_path: Optional[str] = None):
        from codetr_tpu.utils.visualize import draw_detections

        vis = draw_detections(image, det, self.classes)
        if out_path:
            import cv2

            cv2.imwrite(out_path, vis[..., ::-1])  # RGB -> BGR on disk
        return vis
