"""Microbench: Mosaic tpu.dynamic_gather vs splat plane-ops on the real chip.

The round-5 kernel-design question (VERDICT next-round #1a): can an in-VMEM
vectorized gather replace the windowed kernel's splat build?  Mosaic lowers
``jnp.take_along_axis(x (N, M), idx (N, M), axis=0)`` to tpu.dynamic_gather
along sublanes (jax/_src/pallas/mosaic/lowering.py:2464-2523) — per lane,
each output sublane row selects an arbitrary input sublane row.  The MSDA
use: x = window slab (cells, HD=256); idx rows 0..NQ-1 carry per-(query,
head) tap row indices (heads select different rows via different lanes);
the first NQ output rows are the gathered taps.

Measures, per shape (N, 256), R in-kernel iterations each:
  - gather_sub: one take_along_axis along axis 0 (the sublane gather)
  - idxadd:     one full-plane int32 add (the per-corner idx derivation)
  - splat2:     hy[:,None,:]*hx broadcast-multiply + add (2 plane-ops) on
                the SAME element count — the windowed kernel's unit cost
  - fma1:       a*b+c on the same plane (does Mosaic emit a fused op?)

All variants fold their result into a (8, 128) checksum (anti-DCE) and
perturb their input per iteration (anti-hoist).
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64  # in-kernel iterations


def _bench(fn, *args, iters=20):
    fn(*args)[0].block_until_ready()  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)[0].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / R  # ms per in-kernel iteration


def _call(kernel, out_dtype, *args):
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(*args)


@functools.partial(jax.jit, static_argnames=("n", "m", "dt"))
def gather_sub(x, idx, n, m, dt):
    def kernel(xr, ir, outr):
        def body(i, acc):
            ii = (ir[:] + i) % n  # perturb: different rows each iter
            g = jnp.take_along_axis(xr[:], ii, axis=0)
            return acc + g[:8, :128].astype(jnp.float32)

        outr[:] = jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.float32))

    return _call(kernel, dt, x, idx)


@functools.partial(jax.jit, static_argnames=("n", "m", "dt"))
def gather_lane(x, idx, n, m, dt):
    def kernel(xr, ir, outr):
        def body(i, acc):
            ii = (ir[:] + i) % m
            g = jnp.take_along_axis(xr[:], ii, axis=1)
            return acc + g[:8, :128].astype(jnp.float32)

        outr[:] = jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.float32))

    return _call(kernel, dt, x, idx)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def idxadd(idx, n, m):
    def kernel(ir, outr):
        def body(i, acc):
            ii = (ir[:] + i) % n
            return acc + ii[:8, :128].astype(jnp.float32)

        outr[:] = jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.float32))

    return _call(kernel, jnp.int32, idx)


@functools.partial(jax.jit, static_argnames=("wh", "ww", "nq", "dt"))
def splat2(hy, hx, wh, ww, nq, dt):
    # the windowed kernel's expansion unit: S3c = S3c + hy ⊗ hx
    def kernel(hyr, hxr, outr):
        def body(i, acc):
            hyp = hyr[:] + i.astype(hyr.dtype)
            s3 = jnp.zeros((wh, ww, nq), hyr.dtype)
            s3 = s3 + hyp[:, None, :] * hxr[:][None, :, :]
            return acc + s3.reshape(wh * ww, nq)[:8, :128].astype(jnp.float32)

        outr[:] = jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.float32))

    return _call(kernel, dt, hy, hx)


@functools.partial(jax.jit, static_argnames=("n", "m", "dt"))
def fma1(a, b, c, n, m, dt):
    def kernel(ar, br, cr, outr):
        def body(i, acc):
            r = ar[:] * br[:] + (cr[:] + i.astype(cr.dtype))
            return acc + r[:8, :128].astype(jnp.float32)

        outr[:] = jax.lax.fori_loop(0, R, body, jnp.zeros((8, 128), jnp.float32))

    return _call(kernel, dt, a, b, c)


def canary():
    # 4096^3 bf16 matmul pair — MXU health reference (round-4: ~95 TFLOP
    # healthy => ~1.4 ms; degraded sessions 3-10x)
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    f(a).block_until_ready()
    t0 = time.perf_counter()
    f(a).block_until_ready()
    return (time.perf_counter() - t0) * 1e3


def main():
    key = jax.random.PRNGKey(1)
    out = {"canary_matmul_ms": round(canary(), 2)}
    results = {}
    for n in (256, 704, 1040):
        m = 256
        for dt in (jnp.float32, jnp.bfloat16):
            tag = f"{n}x{m}_{jnp.dtype(dt).name}"
            x = jax.random.normal(key, (n, m), dt)
            idx = jnp.asarray(
                np.random.randint(0, n, size=(n, m)), jnp.int32
            )
            try:
                ms = _bench(gather_sub, x, idx, n, m, dt)
                results[f"gather_sub_{tag}"] = round(ms * 1e3, 1)  # us
            except Exception as e:  # noqa: BLE001
                results[f"gather_sub_{tag}"] = f"FAIL: {str(e)[:160]}"
            if dt == jnp.float32:
                try:
                    idxl = jnp.asarray(
                        np.random.randint(0, m, size=(n, m)), jnp.int32
                    )
                    ms = _bench(gather_lane, x, idxl, n, m, dt)
                    results[f"gather_lane_{tag}"] = round(ms * 1e3, 1)
                except Exception as e:  # noqa: BLE001
                    results[f"gather_lane_{tag}"] = f"FAIL: {str(e)[:160]}"
        try:
            ms = _bench(idxadd, idx, n, m)
            results[f"idxadd_{n}x{m}"] = round(ms * 1e3, 1)
        except Exception as e:  # noqa: BLE001
            results[f"idxadd_{n}x{m}"] = f"FAIL: {str(e)[:160]}"
    # splat unit at the lq0@1920 lt0 geometry and a sub-window geometry
    for (wh, ww, nq) in ((26, 40, 256), (22, 32, 256), (8, 128, 256)):
        for dt in (jnp.float32,):
            hy = jax.random.normal(key, (wh, nq), dt)
            hx = jax.random.normal(key, (ww, nq), dt)
            ms = _bench(splat2, hy, hx, wh, ww, nq, dt)
            results[f"splat2_{wh}x{ww}x{nq}_{jnp.dtype(dt).name}"] = round(ms * 1e3, 1)
    for n in (1040,):
        m = 256
        a = jax.random.normal(key, (n, m), jnp.float32)
        ms = _bench(fma1, a, a, a, n, m, jnp.float32)
        results[f"fma1_{n}x{m}_f32"] = round(ms * 1e3, 1)
    out["us_per_op"] = results
    out["canary_matmul_ms_after"] = round(canary(), 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
