"""End-to-end model tests on the tiny config (CPU, random weights) —
mirrors the reference's export tests which build the real architecture without
weights and assert shapes/closeness (tests/test_export.py:228,729-783)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codetr_tpu.config import co_dino_r50, co_dino_swin_l, tiny_test_config
from codetr_tpu.models.codetr import CoDETR, build_codetr
from codetr_tpu.models.resnet import ResNet
from codetr_tpu.models.swin import SwinTransformer
from codetr_tpu.models.channel_mapper import ChannelMapper


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    model, params = build_codetr(cfg, dtype=jnp.float32, msda_impl="reference",
                                 input_shape=(64, 64))
    return cfg, model, params


def test_tiny_swin_backbone_shapes():
    cfg = tiny_test_config()
    model = SwinTransformer(cfg=cfg.swin)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 4
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32), (1, 2, 2, 64),
    ]


@pytest.mark.slow
def test_tiny_swin_nondivisible_input():
    """Input not divisible by patch/window sizes exercises corner padding."""
    cfg = tiny_test_config()
    model = SwinTransformer(cfg=cfg.swin)
    x = jnp.zeros((1, 61, 45, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert outs[0].shape == (1, 16, 12, 8)  # ceil(61/4)=16, ceil(45/4)=12
    assert outs[3].shape == (1, 2, 2, 64)


@pytest.mark.slow
def test_resnet50_shapes():
    cfg = co_dino_r50()
    model = ResNet(cfg=cfg.resnet)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048),
    ]


def test_channel_mapper_five_levels():
    cfg = tiny_test_config()
    model = ChannelMapper(cfg=cfg.neck)
    feats = tuple(
        jnp.zeros((1, 16 // 2**i, 16 // 2**i, c)) for i, c in enumerate(cfg.neck.in_channels)
    )
    params = model.init(jax.random.PRNGKey(0), feats)
    outs = model.apply(params, feats)
    assert len(outs) == 5
    assert outs[4].shape == (1, 1, 1, cfg.neck.out_channels)
    assert all(o.shape[-1] == cfg.neck.out_channels for o in outs)


def test_full_model_forward_shapes_and_finite(tiny_model):
    cfg, model, params = tiny_model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    masks = jnp.zeros((1, 64, 64), jnp.float32)
    boxes, scores, labels = model.apply(params, x, masks)
    assert boxes.shape == (1, cfg.head.max_per_img, 4)
    assert scores.shape == (1, cfg.head.max_per_img)
    assert labels.shape == (1, cfg.head.max_per_img)
    assert bool(jnp.all(jnp.isfinite(boxes)))
    assert bool(jnp.all(jnp.isfinite(scores)))
    assert bool(jnp.all((scores >= 0) & (scores <= 1)))
    assert bool(jnp.all((labels >= 0) & (labels < cfg.head.num_classes)))
    # boxes in pixel space, clamped to image
    assert bool(jnp.all((boxes >= 0) & (boxes <= 64)))
    # scores sorted descending (top_k contract)
    s = np.asarray(scores[0])
    assert np.all(np.diff(s) <= 1e-6)


def test_full_model_with_padding_mask(tiny_model):
    """A padded region must not change with padded-pixel content."""
    cfg, model, params = tiny_model
    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal((1, 64, 64, 3)), np.float32)
    masks = np.ones((1, 64, 64), np.float32)
    masks[:, :48, :48] = 0.0

    b1, s1, l1 = model.apply(params, jnp.asarray(x), jnp.asarray(masks))
    assert bool(jnp.all(jnp.isfinite(b1))) and bool(jnp.all(jnp.isfinite(s1)))


def test_full_model_jit_and_batch(tiny_model):
    cfg, model, params = tiny_model
    fwd = jax.jit(model.apply)
    x = jnp.zeros((2, 64, 64, 3))
    masks = jnp.zeros((2, 64, 64))
    boxes, scores, labels = fwd(params, x, masks)
    assert boxes.shape == (2, cfg.head.max_per_img, 4)
    # identical inputs -> identical outputs across batch
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(boxes[1]), atol=1e-5)


def test_flagship_configs_construct():
    """Swin-L / R50 configs assemble with consistent channel wiring."""
    swin = co_dino_swin_l()
    assert swin.swin.num_features == (192, 384, 768, 1536)
    assert swin.neck.in_channels == swin.swin.num_features
    r50 = co_dino_r50()
    assert r50.resnet.num_features == (256, 512, 1024, 2048)
    assert r50.neck.in_channels == r50.resnet.num_features


@pytest.mark.slow
def test_swin_with_cp_gradient_checkpointing():
    """with_cp (reference swin.py:381-383): remat produces identical forward
    values and finite gradients."""
    import dataclasses

    import jax

    from codetr_tpu.config import SwinConfig
    from codetr_tpu.models.swin import SwinTransformer

    base = SwinConfig(
        embed_dims=16, depths=(2, 2), num_heads=(2, 2), window_size=4,
        out_indices=(0, 1),
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)), jnp.float32)
    m_plain = SwinTransformer(cfg=base)
    params = m_plain.init(jax.random.PRNGKey(0), x)
    m_cp = SwinTransformer(cfg=dataclasses.replace(base, with_cp=True))

    outs_a = m_plain.apply(params, x)
    outs_b = m_cp.apply(params, x)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g = jax.grad(lambda p: sum(jnp.sum(o**2) for o in m_cp.apply(p, x)))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
