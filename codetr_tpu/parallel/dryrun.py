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
    # init through the TRAINING path: it exercises every parameter the
    # inference path uses plus the aux cls branches (0..4) that inference
    # never calls (inference reads only branches nl-1 and nl).
    params = jax.jit(
        lambda k, a, m: model.init(k, a, m, method=model.train_outputs)
    )(jax.random.PRNGKey(0), x, masks)

    tx = optax.adamw(1e-4)
    with mesh:
        state = init_sharded_state(model, params, tx, mesh)
        step = jit_train_step(model, tx, mesh)
        max_gt = 8
        sh = batch_sharding(mesh)
        gt_boxes = jnp.tile(
            jnp.asarray([[0.3, 0.3, 0.2, 0.2], [0.7, 0.6, 0.3, 0.4]] * (max_gt // 2),
                        jnp.float32)[None],
            (bs, 1, 1),
        )
        gt_labels = jnp.tile(jnp.arange(max_gt, dtype=jnp.int32)[None] % 3, (bs, 1))
        gt_valid = jnp.tile((jnp.arange(max_gt) < 3)[None], (bs, 1))
        gt_boxes = jax.device_put(gt_boxes, sh)
        gt_labels = jax.device_put(gt_labels, sh)
        gt_valid = jax.device_put(gt_valid, sh)
        x = jax.device_put(x, sh)
        masks = jax.device_put(masks, sh)
        state, loss = step(state, x, masks, gt_boxes, gt_labels, gt_valid)
        loss = float(loss)
    assert np.isfinite(loss), f"dryrun loss not finite: {loss}"
    print(f"dryrun_multichip ok: mesh={dict(mesh.shape)} loss={loss:.4f}")
