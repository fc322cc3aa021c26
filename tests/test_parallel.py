"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.parallel.dryrun import run_dryrun
from codetr_tpu.parallel.mesh import (
    assert_tp_sharded,
    batch_sharding,
    make_mesh,
    shard_params,
)


def test_mesh_construction():
    mesh = make_mesh(dp=4, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}


def test_shard_params_tp_layout():
    mesh = make_mesh(dp=4, tp=2)
    params = {
        "ffn": {"fc1": {"kernel": jnp.zeros((64, 256))}, "fc2": {"kernel": jnp.zeros((256, 64))}},
        # scan-stacked leaves (encoder layers / swin block pairs): same rule
        # on the trailing axes, stack axis replicated
        "enc": {"fc1": {"kernel": jnp.zeros((6, 64, 256))},
                "qkv": {"kernel": jnp.zeros((6, 64, 192))}},
        "norm": {"scale": jnp.ones((64,))},
    }
    sharded = shard_params(params, mesh)
    P = jax.sharding.PartitionSpec
    assert sharded["ffn"]["fc1"]["kernel"].sharding.spec == P(None, "tp")
    assert sharded["ffn"]["fc2"]["kernel"].sharding.spec == P("tp", None)
    assert sharded["enc"]["fc1"]["kernel"].sharding.spec == P(None, None, "tp")
    assert sharded["enc"]["qkv"]["kernel"].sharding.spec == P(None, None, "tp")
    assert sharded["norm"]["scale"].sharding.spec == P()
    report = assert_tp_sharded(sharded, mesh)
    assert report["sharded_2d_fraction"] > 0.9


def test_assert_tp_sharded_rejects_replicated():
    """The round-2 audit hole: a silently-replicated tree must FAIL."""
    mesh = make_mesh(dp=4, tp=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = {
        "ffn": {"fc1": {"kernel": jax.device_put(
            jnp.zeros((64, 256)), NamedSharding(mesh, P())
        )}},
    }
    with pytest.raises(AssertionError):
        assert_tp_sharded(params, mesh)


@pytest.mark.slow
def test_full_model_tp_coverage():
    """The real (tiny) model tree: the heavy scanned stacks must be sharded."""
    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import build_codetr

    cfg = tiny_test_config()
    model, params = build_codetr(cfg, msda_impl="reference", input_shape=(32, 32))
    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(params, mesh)
    report = assert_tp_sharded(sharded, mesh)
    # encoder ffn stack + swin qkv/ffn stacks dominate the tree
    assert report["sharded_2d_fraction"] > 0.5, report
    enc = sharded["params"]["query_head"]["transformer"]["encoder_layers"]
    assert enc["ffn"]["fc1"]["kernel"].sharding.spec[-1] == "tp"


@pytest.mark.slow
def test_dryrun_full_train_step_8dev():
    run_dryrun(8)


@pytest.mark.slow
def test_batch_sharded_inference_matches_single():
    """dp x tp sharded inference == unsharded results, on the PRODUCTION
    dispatch (msda_impl='auto', the pair-gather paths) — BASELINE config 5
    plus the round-2 VERDICT ask that a non-'reference' impl runs sharded."""
    from codetr_tpu.config import tiny_test_config
    from codetr_tpu.models.codetr import build_codetr

    cfg = tiny_test_config()
    model, params = build_codetr(cfg, msda_impl="auto", input_shape=(32, 32))
    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    m = jnp.zeros((4, 32, 32), jnp.float32)

    with mesh:
        sharded = shard_params(params, mesh)
        assert_tp_sharded(sharded, mesh)
        fwd = jax.jit(model.apply, in_shardings=(None, batch_sharding(mesh), batch_sharding(mesh)))
        b_sh, s_sh, l_sh = fwd(sharded, x, m)
    b, s, l = jax.jit(model.apply)(params, x, m)
    np.testing.assert_allclose(np.asarray(b_sh), np.asarray(b), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s), atol=1e-4, rtol=1e-4)
