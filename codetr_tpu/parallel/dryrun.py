"""Multi-chip dry run: build an n-device mesh, shard the full training step
(dp x tp), run ONE step on tiny shapes.  Executed by the driver on a virtual
CPU mesh to validate the sharding compiles and runs without real chips."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from codetr_tpu.config import tiny_test_config
from codetr_tpu.models.codetr import CoDETR
from codetr_tpu.parallel.mesh import batch_sharding, make_mesh
from codetr_tpu.parallel.train import TrainState, init_sharded_state, jit_train_step


def run_dryrun(n_devices: int, *, dp: int | None = None, tp: int | None = None) -> None:
    devices = jax.devices()[:n_devices]
    n = len(devices)  # degrade gracefully if fewer devices exist than asked
    if tp is None:
        tp = 2 if (n % 2 == 0 and n >= 2) else 1
    mesh = make_mesh(dp=dp, tp=tp, devices=devices)

    cfg = tiny_test_config()
    model = CoDETR(cfg=cfg, dtype=jnp.float32, msda_impl="reference")

    bs = mesh.shape["dp"] * 1
    H = W = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, H, W, 3)), jnp.float32)
    masks = jnp.zeros((bs, H, W), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, masks)

    tx = optax.adamw(1e-4)
    with mesh:
        state = init_sharded_state(model, params, tx, mesh)
        step = jit_train_step(model, tx, mesh)
        n = cfg.head.max_per_img
        tgt_boxes = jax.device_put(jnp.zeros((bs, n, 4)), batch_sharding(mesh))
        tgt_scores = jax.device_put(jnp.full((bs, n), 0.1), batch_sharding(mesh))
        x = jax.device_put(x, batch_sharding(mesh))
        masks = jax.device_put(masks, batch_sharding(mesh))
        state, loss = step(state, x, masks, tgt_boxes, tgt_scores)
        loss = float(loss)
    assert np.isfinite(loss), f"dryrun loss not finite: {loss}"
    print(f"dryrun_multichip ok: mesh={dict(mesh.shape)} loss={loss:.4f}")
