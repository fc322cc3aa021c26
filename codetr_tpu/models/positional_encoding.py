"""Sine positional encodings.

Two variants, matching the reference:
- ``sine_positional_encoding``: cumsum-over-mask image encoding
  (reference: codetr/positional_encoding.py:58-93; temperature=20,
  normalize=True in all configs).
- ``gen_sineembed_for_position``: box-coordinate sine embedding used by the
  decoder's ref_point_head (reference: codetr/transformer.py:156-190).

TPU-first notes: returns NHWC-flattened (bs, H*W, C) directly — the reference
returns (bs, C, H, W) and flattens later; we skip the permute.  All math in
float32, cast to the requested dtype at the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from codetr_tpu.config import PositionalEncodingConfig


def sine_positional_encoding(
    mask: jax.Array,
    cfg: PositionalEncodingConfig,
    dtype=jnp.float32,
) -> jax.Array:
    """mask: (bs, H, W), nonzero = padded/ignored.  Returns (bs, H, W, 2*num_feats)."""
    not_mask = 1.0 - mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if cfg.normalize:
        y_embed = (y_embed + cfg.offset) / (y_embed[:, -1:, :] + cfg.eps) * cfg.scale
        x_embed = (x_embed + cfg.offset) / (x_embed[:, :, -1:] + cfg.eps) * cfg.scale

    dim_t = jnp.arange(cfg.num_feats, dtype=jnp.float32)
    dim_t = cfg.temperature ** (2.0 * jnp.floor(dim_t / 2.0) / cfg.num_feats)
    pos_x = x_embed[..., None] / dim_t  # (bs, H, W, num_feats)
    pos_y = y_embed[..., None] / dim_t

    B, H, W = mask.shape
    # interleave sin(even-indexed) / cos(odd-indexed) as the reference does via
    # stack(...).view (positional_encoding.py:90-92)
    pos_x = jnp.stack((jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])), axis=4).reshape(B, H, W, -1)
    pos_y = jnp.stack((jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])), axis=4).reshape(B, H, W, -1)
    pos = jnp.concatenate((pos_y, pos_x), axis=3)  # (bs, H, W, 2*num_feats)
    return pos.astype(dtype)


def gen_sineembed_for_position(pos_tensor: jax.Array, pos_feat: int) -> jax.Array:
    """Batch-first box sine embedding.

    pos_tensor: (bs, n_query, 2 or 4) normalized coords.
    Returns (bs, n_query, pos_feat * pos_tensor.shape[-1]).
    (reference: gen_sineembed_for_position, codetr/transformer.py:156-190,
    seq-first there; batch-first here.)
    """
    scale = 2.0 * jnp.pi
    dim_t = jnp.arange(pos_feat, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / pos_feat)

    def embed(coord):  # (bs, nq) -> (bs, nq, pos_feat)
        p = coord.astype(jnp.float32)[..., None] * scale / dim_t
        return jnp.stack((jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])), axis=3).reshape(
            coord.shape[0], coord.shape[1], -1
        )

    pos_x = embed(pos_tensor[..., 0])
    pos_y = embed(pos_tensor[..., 1])
    if pos_tensor.shape[-1] == 2:
        out = jnp.concatenate((pos_y, pos_x), axis=2)
    elif pos_tensor.shape[-1] == 4:
        pos_w = embed(pos_tensor[..., 2])
        pos_h = embed(pos_tensor[..., 3])
        out = jnp.concatenate((pos_y, pos_x, pos_w, pos_h), axis=2)
    else:
        raise ValueError(f"pos_tensor last dim must be 2 or 4, got {pos_tensor.shape[-1]}")
    return out.astype(pos_tensor.dtype)
