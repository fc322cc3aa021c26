"""ctypes bindings for the native host library (csrc/codetr_host.cpp).

Build: ``cmake -S csrc -B csrc/build && cmake --build csrc/build`` (or see
csrc/CMakeLists.txt).  All callers fall back to the numpy/cv2 implementations
when the library is absent, so the native path is an optimization, not a
dependency — mirroring how the reference's C++ runtime coexists with its
Python pipeline.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _find_library() -> Optional[str]:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for rel in ("csrc/build/libcodetr_host.so", "csrc/libcodetr_host.so"):
        p = os.path.join(root, rel)
        if os.path.exists(p):
            return p
    return None


def load_host_library(path: Optional[str] = None) -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = path or _find_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.codetr_preprocess.restype = ctypes.c_int
    lib.codetr_preprocess.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int, f32p, f32p, f32p, i32p,
    ]
    lib.codetr_batched_nms.restype = ctypes.c_int
    lib.codetr_batched_nms.argtypes = [
        f32p, f32p, i32p, ctypes.c_int, ctypes.c_float, ctypes.c_float, u8p,
    ]
    lib.codetr_host_version.restype = ctypes.c_char_p
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_host_library() is not None


def preprocess_native(
    image_rgb: np.ndarray, height: int, width: int, mean, std, keep_ratio: bool = True
) -> Tuple[np.ndarray, np.ndarray, Tuple[float, float], Tuple[int, int]]:
    lib = load_host_library()
    assert lib is not None, "native host library not built"
    img = np.ascontiguousarray(image_rgb, np.uint8)
    ih, iw = img.shape[:2]
    out = np.empty((height, width, 3), np.float32)
    mask = np.empty((height, width), np.float32)
    scale = np.empty(2, np.float32)
    resized = np.empty(2, np.int32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    rc = lib.codetr_preprocess(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ih, iw, height, width,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if keep_ratio else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        resized.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert rc == 0, f"codetr_preprocess failed: {rc}"
    return out, mask, (float(scale[0]), float(scale[1])), (int(resized[0]), int(resized[1]))


def batched_nms_native(
    boxes: np.ndarray, scores: np.ndarray, labels: np.ndarray,
    iou_threshold: float, score_threshold: float = -np.inf,
) -> np.ndarray:
    lib = load_host_library()
    assert lib is not None, "native host library not built"
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    n = len(boxes)
    keep = np.zeros(n, np.uint8)
    kept = lib.codetr_batched_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, float(iou_threshold),
        float(score_threshold) if np.isfinite(score_threshold) else -3.4e38,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert kept >= 0
    return keep.astype(bool)
