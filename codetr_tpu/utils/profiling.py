"""Tracing / profiling utilities.

The reference's documented profiling workflow is external (trtexec latency
reports + Nsight Systems over TRT's NVTX markers, README.md:186-274).  The
TPU-native equivalents wrap jax.profiler:

- ``trace(logdir)``: capture an XLA/TPU trace viewable in TensorBoard or
  Perfetto (the Nsight analog; ops appear under jax.named_scope annotations).
- ``annotate(name)``: scope annotation (the NVTX-marker analog).
- ``latency_report(fn, args)``: trtexec-style latency taxonomy: device-loop
  mean, host end-to-end, dispatch overhead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Sequence

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace to ``logdir`` (TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces (NVTX-marker analog)."""
    return jax.named_scope(name)


def latency_report(fn, args: Sequence, *, iterations: int = 20) -> dict:
    """trtexec-style report (README.md:238-245 taxonomy):
    device compute mean (on-device loop), host end-to-end, dispatch cost."""
    out = fn(*args)
    jax.block_until_ready(out)

    def loop(n, *a):
        def body(i, c):
            o = fn(*a)
            return c + jax.tree.leaves(o)[0].reshape(-1)[0].astype(np.float32) * 1e-12

        return jax.lax.fori_loop(0, n, body, 0.0)

    looped = jax.jit(loop, static_argnums=0)
    _ = np.asarray(looped(2, *args))
    t0 = time.perf_counter()
    _ = np.asarray(looped(iterations, *args))
    device_ms = (time.perf_counter() - t0) / iterations * 1e3

    t0 = time.perf_counter()
    _ = np.asarray(jax.tree.leaves(fn(*args))[0])
    e2e_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    fn(*args)  # async dispatch only
    dispatch_ms = (time.perf_counter() - t0) * 1e3
    return {
        "device_compute_ms": device_ms,
        "host_e2e_ms": e2e_ms,
        "dispatch_ms": dispatch_ms,
        "iterations": iterations,
    }


def save_hlo(fn, args: Sequence, path: str):
    """Dump optimized HLO for a jitted function (engine-inspection analog of
    the reference's print_tensorrt_model, export.py:354)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    with open(path, "w") as f:
        f.write(compiled.as_text())
    return path


def cost_analysis(fn, args: Sequence) -> dict:
    """XLA cost analysis (FLOPs / bytes) for a jitted function."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {k: float(v) for k, v in ca.items() if isinstance(v, (int, float))}
