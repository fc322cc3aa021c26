"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.parallel.dryrun import run_dryrun
from codetr_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params


def test_mesh_construction():
    mesh = make_mesh(dp=4, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}


def test_shard_params_tp_layout():
    mesh = make_mesh(dp=4, tp=2)
    params = {
        "ffn": {"fc1": {"kernel": jnp.zeros((64, 256))}, "fc2": {"kernel": jnp.zeros((256, 64))}},
        "norm": {"scale": jnp.ones((64,))},
    }
    sharded = shard_params(params, mesh)
    fc1 = sharded["ffn"]["fc1"]["kernel"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    fc2 = sharded["ffn"]["fc2"]["kernel"]
    assert fc2.sharding.spec == jax.sharding.PartitionSpec("tp", None)
    norm = sharded["norm"]["scale"]
    assert norm.sharding.spec == jax.sharding.PartitionSpec()


def test_dryrun_full_train_step_8dev():
    run_dryrun(8)


def test_batch_sharded_inference_matches_single():
    """dp-sharded batched inference == per-image results (BASELINE config 5)."""
    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import build_codetr

    cfg = tiny_test_config()
    model, params = build_codetr(cfg, msda_impl="reference", input_shape=(32, 32))
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    m = jnp.zeros((8, 32, 32), jnp.float32)

    with mesh:
        fwd = jax.jit(model.apply, in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh)))
        b_sh, s_sh, l_sh = fwd(params, x, m)
    b, s, l = jax.jit(model.apply)(params, x, m)
    np.testing.assert_allclose(np.asarray(b_sh), np.asarray(b), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s), atol=1e-5, rtol=1e-4)
