"""Image preprocessing: keep-ratio resize -> corner pad -> normalize -> mask.

Mirrors the reference pipeline exactly (export.py:97-129: mmdet Resize
keep_ratio + Pad to (width, height) + mean/std normalize; mask 0 inside the
unpadded region, 1 in padding; C++ twin at codetr_inference.cpp:31-81).

Two paths:
- ``preprocess_numpy``: host-side (cv2 bilinear resize like mmcv), for the
  Inferencer CLI.
- ``preprocess_device``: device-side jittable resize+normalize+pad for a
  fixed target shape, fusing preprocessing into the compiled graph (the
  reference must do this outside TRT; on TPU we can keep it on-device).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
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


@partial(jax.jit, static_argnames=("height", "width", "mean", "std"))
def _normalize_pad(image, th, tw, *, height, width, mean, std):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    norm = (image.astype(jnp.float32) - mean) / std
    row = jnp.arange(height)[:, None]
    col = jnp.arange(width)[None, :]
    inside = (row < th) & (col < tw)
    return jnp.where(inside[..., None], norm, 0.0), 1.0 - inside.astype(jnp.float32)


def preprocess_device(
    image_rgb: np.ndarray,
    height: int,
    width: int,
    cfg: PreprocessConfig = PreprocessConfig(),
    keep_ratio: bool = True,
):
    """Device-side variant: bilinear resize via jax.image.resize, then a
    jitted normalize+pad+mask.  Returns the same tuple as preprocess_numpy.

    The resize itself happens at the resized static shape (per-image trace);
    for the fixed-shape serving path prefer resizing on host (cv2) and keeping
    normalize+pad on device.
    """
    oh, ow = image_rgb.shape[:2]
    if keep_ratio:
        tw, th = rescale_size(ow, oh, width, height)
    else:
        tw, th = width, height
    img = jnp.asarray(image_rgb, jnp.float32)
    resized = jax.image.resize(img, (th, tw, 3), method="linear")
    canvas = jnp.zeros((height, width, 3), jnp.float32).at[:th, :tw].set(resized)
    out, mask = _normalize_pad(
        canvas, th, tw, height=height, width=width, mean=tuple(cfg.mean), std=tuple(cfg.std)
    )
    return out, mask, (tw / ow, th / oh), (th, tw)
