"""Brick-level parity tests against torch functional oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from codetr_tpu.config import PositionalEncodingConfig
from codetr_tpu.models.layers import MultiheadAttention, nearest_resize_mask
from codetr_tpu.models.positional_encoding import (
    gen_sineembed_for_position,
    sine_positional_encoding,
)
from codetr_tpu.models.swin import (
    relative_position_index,
    shifted_window_attn_mask,
    window_partition,
    window_reverse,
)


def torch_sine_pos_encoding(mask, num_feats=128, temperature=20, normalize=True,
                            scale=2 * np.pi, eps=1e-6, offset=0.0):
    """Oracle implementing the documented cumsum sine encoding
    (codetr/positional_encoding.py:58-93)."""
    mask = torch.as_tensor(mask).to(torch.int)
    not_mask = 1 - mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    B, H, W = mask.shape
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).view(B, H, W, -1)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).view(B, H, W, -1)
    return torch.cat((pos_y, pos_x), dim=3)  # (B, H, W, 2*num_feats) NHWC


def test_sine_positional_encoding_matches_oracle():
    rng = np.random.default_rng(0)
    mask = np.zeros((2, 9, 13), np.float32)
    mask[0, 6:, :] = 1
    mask[0, :, 10:] = 1
    mask[1, 5:, :] = 1
    cfg = PositionalEncodingConfig(num_feats=64, temperature=20, normalize=True)
    got = sine_positional_encoding(jnp.asarray(mask), cfg)
    want = torch_sine_pos_encoding(mask, num_feats=64).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_gen_sineembed_matches_oracle():
    """Oracle: gen_sineembed formula (codetr/transformer.py:156-190), seq-first
    there; ours is batch-first."""
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 1, (2, 7, 4)).astype(np.float32)
    pos_feat = 32
    got = np.asarray(gen_sineembed_for_position(jnp.asarray(pos), pos_feat))

    scale = 2 * np.pi
    dim_t = torch.arange(pos_feat, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / pos_feat)
    t = torch.from_numpy(pos)
    outs = []
    for j in (1, 0, 2, 3):  # order (y, x, w, h)
        e = t[..., j] * scale
        p = e[..., None] / dim_t
        outs.append(torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), dim=3).flatten(2))
    want = torch.cat(outs, dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_nearest_resize_mask_matches_torch_interpolate():
    rng = np.random.default_rng(2)
    m = (rng.uniform(0, 1, (2, 37, 53)) > 0.5).astype(np.float32)
    for out_h, out_w in [(10, 14), (5, 7), (37, 53), (3, 3)]:
        got = np.asarray(nearest_resize_mask(jnp.asarray(m), out_h, out_w))
        want = F.interpolate(torch.from_numpy(m)[:, None], size=(out_h, out_w))[:, 0].numpy()
        np.testing.assert_array_equal(got, want)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_mmcv_recipe():
    """The mmcv double_step_seq construction (codetr/swin.py:63-66,118-122)
    must equal the standard coordinate-difference formula."""
    for wh, ww in [(7, 7), (12, 12), (3, 5)]:
        seq1 = torch.arange(0, (2 * ww - 1) * wh, 2 * ww - 1)
        seq2 = torch.arange(0, 1 * ww, 1)
        coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
        mmcv_idx = (coords + coords.T).flip(1).numpy()
        np.testing.assert_array_equal(relative_position_index(wh, ww), mmcv_idx)


def test_shifted_window_attn_mask_matches_torch_recipe():
    """Oracle: the reference's in-forward mask construction (swin.py:200-222)."""
    H_pad, W_pad, window, shift = 12, 16, 4, 2
    img_mask = torch.zeros((1, H_pad, W_pad, 1))
    cnt = 0
    for h in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.view(1, H_pad // window, window, W_pad // window, window, 1)
    mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(attn_mask == 0, 0.0)
    got = shifted_window_attn_mask(H_pad, W_pad, window, shift)
    np.testing.assert_array_equal(got, attn_mask.numpy())


def test_multihead_attention_matches_torch():
    """Parity with torch.nn.MultiheadAttention (the reference's decoder
    self-attn, transformer_mmcv.py:361,423) with converted weights."""
    rng = np.random.default_rng(4)
    E, h, bs, nq = 32, 4, 2, 9
    tmha = torch.nn.MultiheadAttention(E, h, batch_first=True)
    tmha.eval()

    q = rng.standard_normal((bs, nq, E)).astype(np.float32)
    qpos = rng.standard_normal((bs, nq, E)).astype(np.float32)

    with torch.no_grad():
        want, _ = tmha(
            torch.from_numpy(q + qpos), torch.from_numpy(q + qpos), torch.from_numpy(q)
        )
        want = (want + torch.from_numpy(q)).numpy()  # residual

    w_in = tmha.in_proj_weight.detach().numpy()  # (3E, E)
    b_in = tmha.in_proj_bias.detach().numpy()
    w_out = tmha.out_proj.weight.detach().numpy()
    b_out = tmha.out_proj.bias.detach().numpy()
    params = {
        "params": {
            "q_proj": {"kernel": w_in[:E].T, "bias": b_in[:E]},
            "k_proj": {"kernel": w_in[E : 2 * E].T, "bias": b_in[E : 2 * E]},
            "v_proj": {"kernel": w_in[2 * E :].T, "bias": b_in[2 * E :]},
            "out_proj": {"kernel": w_out.T, "bias": b_out},
        }
    }
    mod = MultiheadAttention(embed_dims=E, num_heads=h)
    got = mod.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(q), query_pos=jnp.asarray(qpos)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
