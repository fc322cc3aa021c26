"""Shared transformer bricks, re-designed batch-first for TPU.

The reference vendors mmcv's config-dispatched generic layers
(codetr/transformer_mmcv.py: FFN :431, MultiheadAttention :319,
BaseTransformerLayer :503, PatchEmbed :100, PatchMerging :213,
AdaptivePadding :21).  The TPU build drops the string-registry generality —
the operation orders are fixed by the architecture — and keeps everything
batch-first (the reference permutes to (seq, batch, dim) for
torch.nn.MultiheadAttention; XLA has no such preference so we never leave
(batch, seq, dim)).

All normalization/softmax runs in float32 regardless of the compute dtype
(bf16-safe), matching TPU best practice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch parity: LayerNorm/GroupNorm eps
LN_EPS = 1e-5
GN_EPS = 1e-5


class LayerNorm(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(x)


def layer_norm(x, *, dtype, name):
    return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, param_dtype=jnp.float32, name=name)(x)


class Mlp(nn.Module):
    """DETR-style MLP: (num_layers-1) x [Linear, ReLU] + Linear
    (reference: build_MLP, codetr/transformer.py:96-117)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"layers_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.output_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"layers_{self.num_layers - 1}"
        )(x)
        return x


def _stacked_lecun(stack: int):
    """lecun_normal whose fan-in ignores the leading stack axis (each slice
    of a stacked kernel bank initializes like an independent nn.Dense)."""
    if stack:
        return jax.nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1, batch_axis=(0,)
        )
    return nn.initializers.lecun_normal()


class DenseParams(nn.Module):
    """Single-layer analog of :class:`MlpParams`: a (stacked) Dense kernel +
    bias bank (tree ``{"kernel", "bias"}``)."""

    in_dim: int
    out_dim: int
    stack: int = 0

    @nn.compact
    def __call__(self):
        lead = (self.stack,) if self.stack else ()
        return {
            "kernel": self.param(
                "kernel", _stacked_lecun(self.stack), lead + (self.in_dim, self.out_dim), jnp.float32
            ),
            "bias": self.param("bias", nn.initializers.zeros, lead + (self.out_dim,), jnp.float32),
        }


class MlpParams(nn.Module):
    """Parameter bank with the exact tree of :class:`Mlp` (``layers_i``
    submodule scopes holding ``kernel``/``bias``), optionally stacked on a
    leading axis.

    Used where weights must cross a ``nn.scan`` boundary as *data*: the
    decoder consumes one reg-branch slice per scan step (in_axes=0) and the
    shared ref_point_head tree as a broadcast input — neither is expressible
    as an ordinary submodule inside the scanned body (scan would stack the
    shared weights / share the per-layer ones).  Apply with :func:`mlp_apply`.
    """

    in_dim: int
    hidden_dim: int
    output_dim: int
    num_layers: int
    stack: int = 0  # 0 = unstacked

    @nn.compact
    def __call__(self):
        dims_in = [self.in_dim] + [self.hidden_dim] * (self.num_layers - 1)
        dims_out = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        return {
            f"layers_{i}": DenseParams(
                in_dim=di, out_dim=do, stack=self.stack, name=f"layers_{i}"
            )()
            for i, (di, do) in enumerate(zip(dims_in, dims_out))
        }


def mlp_apply(tree, x, *, dtype):
    """Apply an :class:`MlpParams` tree exactly like :class:`Mlp`:
    (n-1) x [Dense, ReLU] + Dense, with nn.Dense's dtype promotion (params
    cast to ``dtype``, fp32 storage)."""
    n = len(tree)
    for i in range(n):
        p = tree[f"layers_{i}"]
        x = x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)
        if i < n - 1:
            x = nn.relu(x)
    return x


def dense_apply(p, x, *, dtype):
    """Apply a :class:`DenseParams` tree like nn.Dense."""
    return x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


class FFN(nn.Module):
    """Feed-forward with residual (reference: transformer_mmcv.py:431-500).
    Dropout is inert at inference and omitted (rates are 0.0 in all configs)."""

    feedforward_channels: int
    embed_dims: int
    add_identity: bool = True
    activation: str = "relu"  # swin uses gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity: Optional[jax.Array] = None):
        out = nn.Dense(self.feedforward_channels, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        out = nn.relu(out) if self.activation == "relu" else nn.gelu(out, approximate=False)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(out)
        if not self.add_identity:
            return out
        if identity is None:
            identity = x
        return identity + out


class MultiheadAttention(nn.Module):
    """Dense multi-head attention with residual, batch-first.

    Equivalent capability to the reference's torch.nn.MultiheadAttention
    wrapper (transformer_mmcv.py:319-428) used for decoder self-attention over
    900 queries.  Projections are separate q/k/v Dense layers; the checkpoint
    converter splits torch's packed in_proj_weight.
    """

    embed_dims: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        key=None,
        value=None,
        identity=None,
        query_pos=None,
        key_pos=None,
        attn_mask=None,
        key_padding_mask=None,
    ):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None and query_pos.shape == key.shape:
            key_pos = query_pos
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos

        d = self.embed_dims // self.num_heads
        dense = lambda name: nn.Dense(self.embed_dims, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        bs, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(bs, nq, self.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(bs, nk, self.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(bs, nk, self.num_heads, d).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (1.0 / jnp.sqrt(d).astype(jnp.float32))
        if attn_mask is not None:
            logits = logits + attn_mask.astype(jnp.float32)
        if key_padding_mask is not None:
            # True = ignore (torch semantics)
            logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bs, nq, self.embed_dims)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)
        return identity + out


def conv2d(
    x,
    features: int,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
    use_bias: bool = True,
    dtype=jnp.float32,
    name: str = "conv",
):
    """NHWC conv wrapper (torch convs are NCHW; the converter transposes
    weights to HWIO)."""
    return nn.Conv(
        features,
        kernel_size,
        strides=strides,
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )(x)


def group_norm(x, num_groups: int, *, dtype, name: str):
    return nn.GroupNorm(
        num_groups=num_groups, epsilon=GN_EPS, dtype=dtype, param_dtype=jnp.float32, name=name
    )(x)


def corner_pad_to_multiple(x_nhwc: jax.Array, multiple_h: int, multiple_w: int) -> jax.Array:
    """AdaptivePadding('corner') for stride==kernel convs
    (reference: transformer_mmcv.py:21-97): zero-pad bottom/right so H, W
    become multiples of the kernel.  Static-shape at trace time."""
    _, H, W, _ = x_nhwc.shape
    pad_h = (-H) % multiple_h
    pad_w = (-W) % multiple_w
    if pad_h or pad_w:
        x_nhwc = jnp.pad(x_nhwc, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return x_nhwc


def nearest_resize_mask(mask: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch F.interpolate(mode='nearest') parity for (bs, H, W) masks
    (used at codetr/co_dino_head.py:155): index = floor(out_idx * in/out)."""
    _, H, W = mask.shape
    rows = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return mask[:, rows][:, :, cols]


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)
