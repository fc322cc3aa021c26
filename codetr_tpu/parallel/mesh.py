"""Device-mesh and sharding helpers.

The reference has no distributed execution at all (SURVEY.md 2.6: no DDP, no
collectives; config names like ``8xb2`` refer to upstream mmdet training).
The TPU build adds the idiomatic JAX scale-out story: a ("dp", "tp") mesh,
GSPMD shardings on params/batch, and XLA-inserted collectives over ICI.

- dp: batch-sharded data parallelism (the free win for batched eval,
  BASELINE.json configs[4]).
- tp: tensor parallelism over the transformer's wide axes (FFN hidden, heads)
  for the 218M-param flagship when memory or latency demands it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_sharding_rule(path: Tuple[str, ...], leaf, mesh: Mesh) -> NamedSharding:
    """Tensor-parallel layout for the heavy transformer weights; everything
    else replicated.

    - FFN fc1 kernel (C, 4C)+: shard the hidden (output) axis over tp
    - FFN fc2 kernel (4C, C): shard the hidden (input) axis over tp
    - qkv/attention projections: shard the head (output) axis
    Scan-stacked kernels (L, in, out) — the encoder layers and Swin block
    pairs stack leaves on axis 0 — get the same layout on their trailing two
    axes (the stack axis is never sharded).
    """
    names = "/".join(path)
    spec = P()
    if leaf.ndim in (2, 3):
        d_in, d_out = leaf.shape[-2], leaf.shape[-1]
        lead = (None,) * (leaf.ndim - 2)
        if "fc1" in names and d_out % mesh.shape["tp"] == 0 and d_out > d_in:
            spec = P(*lead, None, "tp")
        elif "fc2" in names and d_in % mesh.shape["tp"] == 0 and d_in > d_out:
            spec = P(*lead, "tp", None)
        elif any(k in names for k in ("qkv", "q_proj", "k_proj", "v_proj")) and (
            d_out % mesh.shape["tp"] == 0
        ):
            spec = P(*lead, None, "tp")
        elif any(k in names for k in ("proj", "out_proj", "output_proj")) and (
            d_in % mesh.shape["tp"] == 0
        ):
            spec = P(*lead, "tp", None)
    return NamedSharding(mesh, spec)


def shard_params(params, mesh: Mesh):
    """Apply the tp layout to a params pytree."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_names(kp):
        return tuple(getattr(k, "key", str(k)) for k in kp)

    out = [
        jax.device_put(leaf, param_sharding_rule(path_names(kp), leaf, mesh))
        for kp, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def assert_tp_sharded(params, mesh: Mesh, *, min_fraction: float = 0.15) -> dict:
    """Fail loudly if the tp rule silently replicated the model.

    ``param_sharding_rule`` matches on leaf names and falls back to
    replication, so a renamed module could quietly turn tp into a no-op
    (round-2 VERDICT finding).  This checks the *placed* shardings:
    - at least one FFN fc1 kernel ends P(..., None, "tp") and one fc2 ends
      P(..., "tp", None)
    - at least ``min_fraction`` of all matrix-kernel PARAMETERS (2D and
      scan-stacked 3D, by element count) carry a "tp" axis
    Returns a small report dict for logging.
    """
    if mesh.shape["tp"] == 1:
        return {"tp": 1, "skipped": True}
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    total2d = 0
    sharded2d = 0
    seen_fc1 = seen_fc2 = False
    for kp, leaf in flat:
        names = "/".join(getattr(k, "key", str(k)) for k in kp)
        if getattr(leaf, "ndim", 0) not in (2, 3):
            continue
        total2d += leaf.size
        spec = tuple(getattr(leaf.sharding, "spec", P()))
        spec = spec + (None,) * (leaf.ndim - len(spec))
        has_tp = any(
            (s == "tp") or (isinstance(s, tuple) and "tp" in s) for s in spec
        )
        if has_tp:
            sharded2d += leaf.size
            if "fc1" in names and spec[-2:] == (None, "tp"):
                seen_fc1 = True
            if "fc2" in names and spec[-2:] == ("tp", None):
                seen_fc2 = True
    assert seen_fc1, "no FFN fc1 kernel sharded P(None, 'tp') — tp rule is a no-op"
    assert seen_fc2, "no FFN fc2 kernel sharded P('tp', None) — tp rule is a no-op"
    frac = sharded2d / max(total2d, 1)
    assert frac >= min_fraction, (
        f"only {frac:.1%} of 2D-kernel elements carry a tp axis "
        f"(expected >= {min_fraction:.0%})"
    )
    return {"tp": mesh.shape["tp"], "sharded_2d_fraction": round(frac, 3)}


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
