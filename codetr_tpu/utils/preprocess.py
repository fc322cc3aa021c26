"""Image preprocessing: keep-ratio resize -> corner pad -> normalize -> mask.

Mirrors the reference pipeline exactly (export.py:97-129: mmdet Resize
keep_ratio + Pad to (width, height) + mean/std normalize; mask 0 inside the
unpadded region, 1 in padding; C++ twin at codetr_inference.cpp:31-81).

Two paths:
- ``preprocess_numpy``: host-side (cv2 bilinear resize like mmcv), for the
  Inferencer CLI.
- ``preprocess_in_graph``: device-side jittable normalize+pad+mask at the
  FIXED serving shape, fusing preprocessing into the compiled graph (the
  reference must do this outside TRT, export.py:110-129; on TPU the
  serialized executable can accept uint8 directly).  The keep-ratio
  bilinear resize itself stays on host (cv2): its output shape is
  data-dependent per image, and a per-image-shape device resize would
  retrace the fixed-shape executable — the wrong trade for serving.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from codetr_tpu.config import PreprocessConfig


def rescale_size(old_w: int, old_h: int, new_w: int, new_h: int) -> Tuple[int, int]:
    """mmcv keep-ratio resize target: scale by min(new/old) and round."""
    scale = min(new_w / old_w, new_h / old_h)
    return int(old_w * scale + 0.5), int(old_h * scale + 0.5)


def preprocess_numpy(
    image_rgb: np.ndarray,
    height: int,
    width: int,
    cfg: PreprocessConfig = PreprocessConfig(),
    keep_ratio: bool = True,
):
    """image (H, W, 3) RGB uint8 -> (inputs (height, width, 3) float32 NHWC-single,
    mask (height, width), scale_factor (w_scale, h_scale), unpadded (h, w))."""
    import cv2

    oh, ow = image_rgb.shape[:2]
    if keep_ratio:
        tw, th = rescale_size(ow, oh, width, height)
    else:
        tw, th = width, height
    resized = cv2.resize(image_rgb, (tw, th), interpolation=cv2.INTER_LINEAR)
    scale_factor = (tw / ow, th / oh)

    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    out = np.zeros((height, width, 3), np.float32)
    out[:th, :tw] = (resized.astype(np.float32) - mean) / std

    mask = np.ones((height, width), np.float32)
    mask[:th, :tw] = 0.0
    return out, mask, scale_factor, (th, tw)


def preprocess_in_graph(canvas_u8, thw, *, mean, std):
    """Traceable device-side normalize+pad+mask (north-star: preprocessing
    fused into the compiled graph; the executable accepts uint8 images).

    Args:
      canvas_u8: (bs, height, width, 3) uint8 RGB — each image cv2-resized
        on host (keep-ratio) and placed top-left on the fixed canvas; bytes
        outside the (th, tw) valid region are arbitrary (masked here).
      thw: (bs, 2) int32 valid (th, tw) per image.
      mean/std: PreprocessConfig channel stats (python tuples or arrays).

    Returns (inputs (bs, H, W, 3) float32, mask (bs, H, W) float32) —
    bit-identical semantics to preprocess_numpy's normalize+pad+mask step
    (same f32 formula, zeros outside, mask 1 in padding).
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    _, height, width, _ = canvas_u8.shape
    norm = (canvas_u8.astype(jnp.float32) - mean) / std
    row = jnp.arange(height)[None, :, None]
    col = jnp.arange(width)[None, None, :]
    inside = (row < thw[:, 0][:, None, None]) & (col < thw[:, 1][:, None, None])
    return (
        jnp.where(inside[..., None], norm, 0.0),
        1.0 - inside.astype(jnp.float32),
    )


def resize_to_canvas(
    image_rgb: np.ndarray,
    height: int,
    width: int,
    keep_ratio: bool = True,
):
    """Host half of the fused path: cv2 keep-ratio resize onto a fixed uint8
    canvas.  Returns (canvas (height, width, 3) uint8, (th, tw) int,
    scale_factor (w_scale, h_scale)) — feed canvas+thw to a graph that
    starts with preprocess_in_graph."""
    import cv2

    oh, ow = image_rgb.shape[:2]
    if keep_ratio:
        tw, th = rescale_size(ow, oh, width, height)
    else:
        tw, th = width, height
    canvas = np.zeros((height, width, 3), np.uint8)
    canvas[:th, :tw] = cv2.resize(
        image_rgb, (tw, th), interpolation=cv2.INTER_LINEAR
    )
    return canvas, (th, tw), (tw / ow, th / oh)
