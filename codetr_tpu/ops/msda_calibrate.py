"""Correction-path calibration for the windowed MSDA kernel.

The windowed splat-matmul kernel (ops/msda_win.py) is exact only inside its
per-tap window envelope; out-of-envelope taps are zeroed in-kernel and
restored by a tiered correction (ops/msda.py:_win_exact_ad_packed):

  n_out == 0                     -> no correction (hot path)
  n_out <= correction_budget     -> sparse compact+gather, O(budget) rows
  n_out >  correction_budget     -> full masked-oracle pass (gather cost:
                                    130 / 773 ms per call at the 608 / 1920
                                    encoder scales, ROUND3_NOTES.md)

The reference's offset init reaches exactly +-4 px
(multi_scale_deformable_attention.py:97-115), but that is only a LOWER bound
on trained offsets — a checkpoint can learn arbitrarily large ones.  This
module sizes ``grid_radius`` and ``correction_budget`` from the offsets a
given checkpoint actually produces, instead of the round-3 hard-coded
(5, 16384) guess (round-3 VERDICT item 3):

- :func:`fire_rate_table` measures the out-of-envelope tap count per radius
  for given sampling coordinates (e.g. from a calibration batch).
- :func:`suggest_correction` picks the cheapest (radius, budget) pair under
  a cost model with measured per-unit constants: bigger radii grow every
  (WinH, WinW, NQ) splat plane; bigger budgets grow the sparse correction's
  gather/scatter.  The budget gets a safety factor so image-to-image
  variation cannot silently fall off the sparse tier onto the full-oracle
  cliff.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Shapes = Tuple[Tuple[int, int], ...]


def fire_rate_table(
    spatial_shapes: Shapes,
    x,  # (bs, h, L, P, K) normalized sampling x
    y,
    w=None,  # optional weights: taps with zero weight never fire
    radii: Sequence[int] = (3, 4, 5, 6, 8),
) -> Dict[int, int]:
    """Out-of-envelope tap count per candidate radius for these coordinates.

    Runs the exact same ``win_envelope_mask`` the production dispatch uses,
    so the counts are the counts the kernel's correction will see."""
    from codetr_tpu.ops.msda_win import win_envelope_mask

    out = {}
    for r in radii:
        mask = win_envelope_mask(spatial_shapes, x, y, radius=int(r))
        fire = ~mask
        if w is not None:
            fire = fire & (w != 0)
        out[int(r)] = int(jnp.sum(fire))
    return out


@dataclasses.dataclass
class CorrectionPlan:
    radius: int
    budget: int
    fire_rate: Dict[int, int]  # radius -> measured out-of-envelope taps
    est_ms: Dict[int, float]  # radius -> estimated per-call cost (ms)


def _kernel_cost_model(spatial_shapes: Shapes, radius: int) -> float:
    """Estimated splat-kernel ms/call at this radius: plane-ops (the VPU
    splat build, the measured dominant term) scale with Σ tiles x taps x
    cells(radius) x NQ.  The constant is calibrated from the round-4 raw
    measurement of the production config (lq0 @1920 r5: 29.2 ms for 2.75e10
    bf16 plane-op units -> ~0.94 T units/ms... expressed per unit)."""
    from codetr_tpu.ops.msda_win import _tile_shape_for_level, _win_geometry

    L = len(spatial_shapes)
    units = 0.0
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        th, tw = _tile_shape_for_level(lq, L)
        if th * tw < 16:
            continue  # oracle-routed
        (th, tw), win = _win_geometry(lq, spatial_shapes, radius)
        ntiles = (-(-Hq // th)) * (-(-Wq // tw))
        NQ = max(th * tw, 128)  # lane padding
        cells = sum(wh * ww for wh, ww in win)
        # 8 heads x 4 points x 2 ops per (cells, NQ) plane
        units += ntiles * 64.0 * cells * NQ
    return units / 0.94e9  # ms


def _sparse_cost_ms(budget: int, n_taps_total: int) -> float:
    """Sparse-correction cost: O(K) compaction (~2 passes over the tap
    count) + 4 gather rows per budgeted tap at the measured ~80 M rows/s."""
    return n_taps_total / 4.0e9 + 4.0 * budget / 8.0e7 * 1e3 / 1e3


def suggest_correction(
    spatial_shapes: Shapes,
    x,
    y,
    w=None,
    radii: Sequence[int] = (3, 4, 5, 6, 8),
    safety: float = 4.0,
    min_budget: int = 4096,
) -> CorrectionPlan:
    """Pick (radius, correction_budget) minimizing estimated per-call cost
    for the measured fire rates, with ``safety`` headroom on the budget."""
    fires = fire_rate_table(spatial_shapes, x, y, w, radii)
    bs, h, L, P, K = np.shape(x)
    n_taps = int(bs * h * L * P * K)
    est = {}
    for r in radii:
        budget = max(min_budget, int(fires[r] * safety))
        est[r] = _kernel_cost_model(spatial_shapes, r) + (
            _sparse_cost_ms(budget, n_taps) if fires[r] > 0 else 0.0
        )
    best = min(est, key=lambda r: est[r])
    return CorrectionPlan(
        radius=int(best),
        budget=max(min_budget, int(fires[best] * safety)),
        fire_rate=fires,
        est_ms={k: round(v, 3) for k, v in est.items()},
    )


def calibrate_model(
    model,
    params,
    batch_inputs,
    img_masks,
    *,
    radii: Sequence[int] = (3, 4, 5, 6, 8),
    safety: float = 4.0,
) -> CorrectionPlan:
    """Checkpoint-day calibration: run the REAL model on a calibration batch,
    capture the encoder MSDA sampling coordinates every layer actually
    produces (flax ``sow`` in models/msda_module.py, stacked across the
    scanned encoder layers), and size (grid_radius, correction_budget) from
    their measured fire rates.  This is the step the reference has no analog
    for — its CUDA kernel gathers anywhere, while the windowed kernel's
    exactness tiers must be provisioned for the checkpoint's offset range
    (ROUND4_NOTES.md fire-rate table: a trained checkpoint at init-scale
    drift fires 188k-257k taps at r=5, far over any static default)."""
    import jax as _jax

    _, state = model.apply(
        params, batch_inputs, img_masks, mutable=["intermediates"]
    )
    # every sown leaf in "intermediates" is a sampling_coords capture; they
    # come in (xy, attn) pairs, each (layers, bs, K, C) from the scanned
    # encoder (decoder MSDA does not sow — it runs the gather fallback)
    coords = [np.asarray(v) for v in _jax.tree.leaves(state["intermediates"])]
    assert coords and len(coords) % 2 == 0, "no sampling_coords captured"
    H, W = batch_inputs.shape[1], batch_inputs.shape[2]  # NHWC
    strides = (4, 8, 16, 32, 64)
    spatial_shapes = tuple((-(-H // s), -(-W // s)) for s in strides)
    mc = model.cfg.head.transformer.encoder_layer.attn
    h_, L_, P_ = mc.num_heads, mc.num_levels, mc.num_points
    xs, ys, ws = [], [], []
    for xy, attn in zip(coords[0::2], coords[1::2]):
        K = xy.shape[-2]
        HLP = h_ * L_ * P_
        # the packed pipeline pads the channel axis to a lane-tile multiple
        flat = xy[..., : 2 * HLP].reshape(-1, K, 2, HLP)  # [x | y] blocks
        x = flat[:, :, 0, :].reshape(-1, K, h_, L_, P_).transpose(0, 2, 3, 4, 1)
        y = flat[:, :, 1, :].reshape(-1, K, h_, L_, P_).transpose(0, 2, 3, 4, 1)
        w = (
            attn[..., :HLP].reshape(-1, K, h_, L_, P_).transpose(0, 2, 3, 4, 1)
        )
        xs.append(x)
        ys.append(y)
        ws.append(w)
    return suggest_correction(
        spatial_shapes,
        np.concatenate(xs, 0),
        np.concatenate(ys, 0),
        np.concatenate(ws, 0),
        radii=radii,
        safety=safety,
    )


def synthetic_trained_offsets(
    spatial_shapes: Shapes,
    *,
    num_heads: int = 8,
    num_points: int = 4,
    scale: float = 1.0,
    tail_frac: float = 0.0,
    tail_scale: float = 4.0,
    seed: int = 0,
    batch: int = 1,
):
    """Trained-LIKE sampling coordinates for robustness studies: the grid
    anchor plus the reference's radial init offsets scaled by ``scale``, with
    a ``tail_frac`` fraction of taps drawn from a ``tail_scale``-times wider
    heavy tail (trained MSDA offsets keep the init's shape but grow tails).
    Returns (x, y, w) in the q-minor (bs, h, L, P, K) layout."""
    from codetr_tpu.models.msda_module import _grid_offset_bias
    from codetr_tpu.ops.msda_grid import _anchor

    L = len(spatial_shapes)
    K = sum(hh * ww for hh, ww in spatial_shapes)
    h, P = num_heads, num_points
    rng = np.random.default_rng(seed)
    # _grid_offset_bias emits the deinterleaved [x | y] projection layout;
    # recover the (h, L, P, 2) view for the anchor math here
    bias = np.moveaxis(_grid_offset_bias(h, L, P).reshape(2, h, L, P), 0, -1)

    x = np.zeros((batch, h, L, P, K), np.float32)
    y = np.zeros_like(x)
    q0 = 0
    for lq, (Hq, Wq) in enumerate(spatial_shapes):
        iy, ix = np.meshgrid(np.arange(Hq), np.arange(Wq), indexing="ij")
        for lt, (Ht, Wt) in enumerate(spatial_shapes):
            ay = _anchor(iy, Hq, Ht).reshape(-1) + 0.5
            ax = _anchor(ix, Wq, Wt).reshape(-1) + 0.5
            off = bias[:, lt][:, :, None, :] * scale  # (h, P, 1, 2)
            jit = rng.normal(0, 0.25 * scale, (h, P, Hq * Wq, 2))
            if tail_frac > 0:
                heavy = rng.random((h, P, Hq * Wq, 1)) < tail_frac
                jit = np.where(
                    heavy, rng.normal(0, tail_scale * scale, jit.shape), jit
                )
            o = off + jit
            y[0, :, lt, :, q0:q0 + Hq * Wq] = (ay + o[..., 1]) / Ht
            x[0, :, lt, :, q0:q0 + Hq * Wq] = (ax + o[..., 0]) / Wt
        q0 += Hq * Wq
    w = rng.uniform(0, 1, (batch, h, L, P, K)).astype(np.float32)
    w /= w.sum(axis=(2, 3), keepdims=True)
    if batch > 1:
        x = np.broadcast_to(x[:1], x.shape).copy()
        y = np.broadcast_to(y[:1], y.shape).copy()
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)
