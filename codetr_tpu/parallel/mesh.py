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
    """
    names = "/".join(path)
    spec = P()
    if leaf.ndim == 2:
        d_in, d_out = leaf.shape
        if "fc1" in names and d_out % mesh.shape["tp"] == 0 and d_out > d_in:
            spec = P(None, "tp")
        elif "fc2" in names and d_in % mesh.shape["tp"] == 0 and d_in > d_out:
            spec = P("tp", None)
        elif any(k in names for k in ("qkv", "q_proj", "k_proj", "v_proj")) and (
            d_out % mesh.shape["tp"] == 0
        ):
            spec = P(None, "tp")
        elif any(k in names for k in ("proj", "out_proj", "output_proj")) and (
            d_in % mesh.shape["tp"] == 0
        ):
            spec = P("tp", None)
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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
