"""Weight-conversion tests.

The permutation-sensitive paths (PatchMerging unfold ordering, packed-MHA
split, conv layout) are verified numerically against torch modules; full-tree
coverage is verified by synthesizing an mmdet-layout state dict for the tiny
config and loading the converted tree into the flax model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from codetr_tpu.config import tiny_test_config
from codetr_tpu.models.codetr import CoDETR, build_codetr
from codetr_tpu.models.swin import PatchMerging
from codetr_tpu.utils.checkpoint import (
    _unfold_to_position_major,
    convert_state_dict,
    swin_original_to_mmdet,
)


class TorchPatchMergingOracle(nn.Module):
    """mmdet-style PatchMerging: unfold(2,2) -> LN -> Linear(no bias)
    (reference: transformer_mmcv.py:213-316)."""

    def __init__(self, c_in, c_out):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * c_in)
        self.reduction = nn.Linear(4 * c_in, c_out, bias=False)

    def forward(self, x_nchw):
        B, C, H, W = x_nchw.shape
        x = self.sampler(x_nchw)  # (B, 4C, L) channel-major
        x = x.transpose(1, 2)  # (B, L, 4C)
        return self.reduction(self.norm(x))


def test_patch_merging_conversion_matches_torch_unfold():
    torch.manual_seed(0)
    c_in, c_out, H, W = 6, 12, 8, 10
    oracle = TorchPatchMergingOracle(c_in, c_out).eval()
    x = torch.randn(2, c_in, H, W)
    with torch.no_grad():
        want = oracle(x).numpy().reshape(2, H // 2, W // 2, c_out)

    params = {
        "params": {
            "norm": {
                "scale": _unfold_to_position_major(oracle.norm.weight.detach().numpy(), c_in),
                "bias": _unfold_to_position_major(oracle.norm.bias.detach().numpy(), c_in),
            },
            "reduction": {
                "kernel": _unfold_to_position_major(
                    oracle.reduction.weight.detach().numpy(), c_in, axis=1
                ).T,
            },
        }
    }
    mod = PatchMerging(out_channels=c_out)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = mod.apply(jax.tree.map(jnp.asarray, params), x_nhwc)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_swin_original_to_mmdet_keys_and_patchmerge_values():
    """Original-repo key remap + 4-block reorder (swin_converter analog,
    codetr/swin.py:752-803)."""
    rng = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.standard_normal((8, 3, 4, 4)).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.weight": rng.standard_normal((24, 8)).astype(np.float32),
        "layers.0.blocks.0.mlp.fc1.weight": rng.standard_normal((16, 8)).astype(np.float32),
        "layers.0.blocks.0.mlp.fc2.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "layers.0.downsample.reduction.weight": rng.standard_normal((16, 32)).astype(np.float32),
        "layers.0.downsample.norm.weight": rng.standard_normal((32,)).astype(np.float32),
        "head.fc.weight": rng.standard_normal((10, 8)).astype(np.float32),
    }
    out = swin_original_to_mmdet(sd)
    assert "backbone.patch_embed.projection.weight" in out
    assert "backbone.stages.0.blocks.0.attn.w_msa.qkv.weight" in out
    assert "backbone.stages.0.blocks.0.ffn.layers.0.0.weight" in out
    assert "backbone.stages.0.blocks.0.ffn.layers.1.weight" in out
    assert not any(k.startswith("backbone.head") for k in out)

    # original-repo concat order is [x00, x10, x01, x11] position-major; after
    # the [0,2,1,3] block permutation the columns must equal mmdet's
    # channel-major unfold order.  Verify via a full numeric roundtrip:
    # original-layout weight applied to original-layout input == converted
    # weight applied to unfold-layout input.
    C = 8
    x = rng.standard_normal((1, C, 4, 4)).astype(np.float32)
    tx = torch.from_numpy(x)
    x00 = tx[:, :, 0::2, 0::2]
    x10 = tx[:, :, 1::2, 0::2]
    x01 = tx[:, :, 0::2, 1::2]
    x11 = tx[:, :, 1::2, 1::2]
    orig_in = torch.cat([x00, x10, x01, x11], dim=1).flatten(2).transpose(1, 2)  # (1, L, 4C)
    w_orig = torch.from_numpy(sd["layers.0.downsample.reduction.weight"])
    want = (orig_in @ w_orig.T).numpy()

    unfold_in = torch.nn.functional.unfold(tx, kernel_size=2, stride=2).transpose(1, 2)
    w_mm = torch.from_numpy(out["backbone.stages.0.downsample.reduction.weight"])
    got = (unfold_in @ w_mm.T).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def _linear(rng, o, i):
    return rng.standard_normal((o, i)).astype(np.float32) * 0.02


def make_tiny_mmdet_state_dict(cfg):
    """Synthesize an mmdet-layout CoDETR state dict for the tiny config —
    an independent enumeration of the torch key schema."""
    rng = np.random.default_rng(0)
    sd = {}

    def add_ln(prefix, dim):
        sd[f"{prefix}.weight"] = np.ones(dim, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    sc = cfg.swin
    sd["backbone.patch_embed.projection.weight"] = rng.standard_normal(
        (sc.embed_dims, 3, 4, 4)).astype(np.float32) * 0.02
    sd["backbone.patch_embed.projection.bias"] = np.zeros(sc.embed_dims, np.float32)
    add_ln("backbone.patch_embed.norm", sc.embed_dims)
    dims = sc.embed_dims
    for i, depth in enumerate(sc.depths):
        for b in range(depth):
            p = f"backbone.stages.{i}.blocks.{b}"
            add_ln(f"{p}.norm1", dims)
            add_ln(f"{p}.norm2", dims)
            nrel = (2 * sc.window_size - 1) ** 2
            sd[f"{p}.attn.w_msa.relative_position_bias_table"] = (
                rng.standard_normal((nrel, sc.num_heads[i])).astype(np.float32) * 0.02)
            sd[f"{p}.attn.w_msa.qkv.weight"] = _linear(rng, 3 * dims, dims)
            sd[f"{p}.attn.w_msa.qkv.bias"] = np.zeros(3 * dims, np.float32)
            sd[f"{p}.attn.w_msa.proj.weight"] = _linear(rng, dims, dims)
            sd[f"{p}.attn.w_msa.proj.bias"] = np.zeros(dims, np.float32)
            sd[f"{p}.ffn.layers.0.0.weight"] = _linear(rng, sc.mlp_ratio * dims, dims)
            sd[f"{p}.ffn.layers.0.0.bias"] = np.zeros(sc.mlp_ratio * dims, np.float32)
            sd[f"{p}.ffn.layers.1.weight"] = _linear(rng, dims, sc.mlp_ratio * dims)
            sd[f"{p}.ffn.layers.1.bias"] = np.zeros(dims, np.float32)
        if i < len(sc.depths) - 1:
            p = f"backbone.stages.{i}.downsample"
            add_ln(f"{p}.norm", 4 * dims)
            sd[f"{p}.reduction.weight"] = _linear(rng, 2 * dims, 4 * dims)
            dims *= 2
    for i in sc.out_indices:
        add_ln(f"backbone.norm{i}", sc.num_features[i])

    nc = cfg.neck
    for i, cin in enumerate(nc.in_channels):
        sd[f"neck.convs.{i}.conv.weight"] = rng.standard_normal(
            (nc.out_channels, cin, 1, 1)).astype(np.float32) * 0.02
        sd[f"neck.convs.{i}.conv.bias"] = np.zeros(nc.out_channels, np.float32)
        add_ln(f"neck.convs.{i}.gn", nc.out_channels)
    for j in range(nc.num_outs - len(nc.in_channels)):
        sd[f"neck.extra_convs.{j}.conv.weight"] = rng.standard_normal(
            (nc.out_channels, nc.in_channels[-1] if j == 0 else nc.out_channels, 3, 3)
        ).astype(np.float32) * 0.02
        sd[f"neck.extra_convs.{j}.conv.bias"] = np.zeros(nc.out_channels, np.float32)
        add_ln(f"neck.extra_convs.{j}.gn", nc.out_channels)

    hc = cfg.head
    tc = hc.transformer
    E = tc.embed_dims
    for i in range(tc.num_decoder_layers + 1):
        sd[f"query_head.cls_branches.{i}.weight"] = _linear(rng, hc.num_classes, E)
        sd[f"query_head.cls_branches.{i}.bias"] = np.zeros(hc.num_classes, np.float32)
        for ti in range(0, 2 * hc.num_reg_fcs + 1, 2):
            out_d = 4 if ti == 2 * hc.num_reg_fcs else E
            sd[f"query_head.reg_branches.{i}.{ti}.weight"] = _linear(rng, out_d, E)
            sd[f"query_head.reg_branches.{i}.{ti}.bias"] = np.zeros(out_d, np.float32)

    t = "query_head.transformer"
    sd[f"{t}.level_embeds"] = rng.standard_normal((tc.num_feature_levels, E)).astype(np.float32)
    sd[f"{t}.enc_output.weight"] = _linear(rng, E, E)
    sd[f"{t}.enc_output.bias"] = np.zeros(E, np.float32)
    add_ln(f"{t}.enc_output_norm", E)
    sd[f"{t}.query_embed.weight"] = rng.standard_normal(
        (tc.two_stage_num_proposals, E)).astype(np.float32)

    def add_msda(p, mc):
        n_off = mc.num_heads * mc.num_levels * mc.num_points
        sd[f"{p}.sampling_offsets.weight"] = _linear(rng, n_off * 2, E)
        sd[f"{p}.sampling_offsets.bias"] = np.zeros(n_off * 2, np.float32)
        sd[f"{p}.attention_weights.weight"] = _linear(rng, n_off, E)
        sd[f"{p}.attention_weights.bias"] = np.zeros(n_off, np.float32)
        sd[f"{p}.value_proj.weight"] = _linear(rng, E, E)
        sd[f"{p}.value_proj.bias"] = np.zeros(E, np.float32)
        sd[f"{p}.output_proj.weight"] = _linear(rng, E, E)
        sd[f"{p}.output_proj.bias"] = np.zeros(E, np.float32)

    def add_ffn(p, ffc):
        sd[f"{p}.layers.0.0.weight"] = _linear(rng, ffc, E)
        sd[f"{p}.layers.0.0.bias"] = np.zeros(ffc, np.float32)
        sd[f"{p}.layers.1.weight"] = _linear(rng, E, ffc)
        sd[f"{p}.layers.1.bias"] = np.zeros(E, np.float32)

    for l in range(tc.num_encoder_layers):
        p = f"{t}.encoder.layers.{l}"
        add_msda(f"{p}.attentions.0", tc.encoder_layer.attn)
        add_ln(f"{p}.norms.0", E)
        add_ln(f"{p}.norms.1", E)
        add_ffn(f"{p}.ffns.0", tc.encoder_layer.feedforward_channels)
    for l in range(tc.num_decoder_layers):
        p = f"{t}.decoder.layers.{l}"
        sd[f"{p}.attentions.0.attn.in_proj_weight"] = _linear(rng, 3 * E, E)
        sd[f"{p}.attentions.0.attn.in_proj_bias"] = np.zeros(3 * E, np.float32)
        sd[f"{p}.attentions.0.attn.out_proj.weight"] = _linear(rng, E, E)
        sd[f"{p}.attentions.0.attn.out_proj.bias"] = np.zeros(E, np.float32)
        add_msda(f"{p}.attentions.1", tc.decoder_layer.cross_attn)
        add_ln(f"{p}.norms.0", E)
        add_ln(f"{p}.norms.1", E)
        add_ln(f"{p}.norms.2", E)
        add_ffn(f"{p}.ffns.0", tc.decoder_layer.feedforward_channels)
    sd[f"{t}.decoder.ref_point_head.0.weight"] = _linear(rng, E, 2 * E)
    sd[f"{t}.decoder.ref_point_head.0.bias"] = np.zeros(E, np.float32)
    sd[f"{t}.decoder.ref_point_head.2.weight"] = _linear(rng, E, E)
    sd[f"{t}.decoder.ref_point_head.2.bias"] = np.zeros(E, np.float32)
    add_ln(f"{t}.decoder.norm", E)
    return sd


@pytest.mark.slow
def test_full_tree_conversion_loads_and_runs():
    cfg = tiny_test_config()
    sd = make_tiny_mmdet_state_dict(cfg)
    params = convert_state_dict(sd, cfg)

    model, ref_params = build_codetr(cfg, dtype=jnp.float32, msda_impl="reference",
                                     input_shape=(64, 64))
    # identical tree structure and shapes
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, "converted tree differs from init tree"

    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 3)), jnp.float32)
    m = jnp.zeros((1, 64, 64))
    boxes, scores, labels = model.apply(jax.tree.map(jnp.asarray, params), x, m)
    assert boxes.shape == (1, cfg.head.max_per_img, 4)
    assert bool(jnp.all(jnp.isfinite(boxes)))
