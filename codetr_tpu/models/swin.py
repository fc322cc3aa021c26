"""Swin Transformer backbone, TPU-native.

Re-designs the reference backbone (codetr/swin.py: WindowMSA :23,
ShiftWindowMSA :125, SwinBlock :288, SwinBlockSequence :389,
SwinTransformer :482) for XLA:

- NHWC feature layout end-to-end; window partition/reverse are pure reshapes
  and transposes with static shapes resolved at trace time.
- The shifted-window attention mask and the relative-position-bias index are
  compile-time numpy constants (the reference builds them with tensor ops in
  the forward pass, swin.py:200-222).
- Cyclic shift via jnp.roll (XLA lowers this to a static rotate).
- Inference path: dropout / stochastic-depth are inert (rates only affect
  training) and are omitted.

Weight compatibility: parameter shapes mirror the mmcv checkpoint layout
(packed qkv, bias table of shape ((2Wh-1)*(2Ww-1), nH)) so the .pth converter
is a pure transpose/rename (see codetr_tpu/utils/checkpoint.py, the analog of
swin_converter at codetr/swin.py:752-803).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from codetr_tpu.config import SwinConfig
from codetr_tpu.models.layers import FFN, corner_pad_to_multiple, layer_norm


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Index into the (2Wh-1)(2Ww-1) bias table for each (query, key) pair.

    Equivalent to mmcv's double_step_seq construction (codetr/swin.py:63-66,
    118-122): entry (i, j) = (yi - yj + Wh - 1) * (2Ww - 1) + (xi - xj + Ww - 1).
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"), axis=0)
    coords = coords.reshape(2, -1)  # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    return ((rel[0] + wh - 1) * (2 * ww - 1) + (rel[1] + ww - 1)).astype(np.int32)


def shifted_window_attn_mask(h_pad: int, w_pad: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask: 0 for same-region pairs, -100 otherwise
    (reference: swin.py:200-222).  Pure numpy — resolved at trace time."""
    img = np.zeros((h_pad, w_pad), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h_pad // window, window, w_pad // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)  # (nW, N)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, window*window, C); H, W divisible by window."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def window_reverse(windows: jax.Array, window: int, H: int, W: int) -> jax.Array:
    """(B*nW, window*window, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H // window * W // window)
    x = windows.reshape(B, H // window, W // window, window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class WindowMSA(nn.Module):
    """Window attention with relative position bias (reference: swin.py:23-116)."""

    embed_dims: int
    num_heads: int
    window_size: Tuple[int, int]
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray] = None) -> jax.Array:
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        scale = self.qk_scale or d**-0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, d).transpose(2, 0, 3, 1, 4)  # (3, B, h, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32)

        wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), h),
            jnp.float32,
        )
        idx = relative_position_index(wh, ww)  # (N, N) static
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)  # (h, N, N)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask, attn.dtype)  # (nW, N, N)
            attn = attn.reshape(B // nW, nW, h, N, N) + m[None, :, None]
            attn = attn.reshape(B, h, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class ShiftWindowMSA(nn.Module):
    """(Shifted-)window attention over an NHWC map (reference: swin.py:125-252)."""

    embed_dims: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        ws = self.window_size
        x = corner_pad_to_multiple(x, ws, ws)
        H_pad, W_pad = x.shape[1], x.shape[2]
        shift = self.shift_size

        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = shifted_window_attn_mask(H_pad, W_pad, ws, shift)
        else:
            mask = None

        windows = window_partition(x, ws)  # (B*nW, ws*ws, C)
        attn = WindowMSA(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            window_size=(ws, ws),
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dtype=self.dtype,
            name="w_msa",
        )(windows, mask)
        x = window_reverse(attn, ws, H_pad, W_pad)

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if H_pad != H or W_pad != W:
            x = x[:, :H, :W, :]
        return x


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> +res -> LN -> FFN(gelu) (reference: swin.py:288-386)."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    window_size: int
    shift: bool
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        identity = x
        y = layer_norm(x, dtype=self.dtype, name="norm1")
        y = ShiftWindowMSA(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            window_size=self.window_size,
            shift_size=self.window_size // 2 if self.shift else 0,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dtype=self.dtype,
            name="attn",
        )(y)
        x = identity + y

        identity = x
        y = layer_norm(x, dtype=self.dtype, name="norm2")
        y = FFN(
            feedforward_channels=self.feedforward_channels,
            embed_dims=self.embed_dims,
            activation="gelu",
            add_identity=False,
            dtype=self.dtype,
            name="ffn",
        )(y.reshape(B, H * W, C)).reshape(B, H, W, C)
        return identity + y


class PatchEmbed(nn.Module):
    """Corner-pad + conv(k=4, s=4) + LN (reference: transformer_mmcv.py:100-210)."""

    embed_dims: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = corner_pad_to_multiple(x, self.patch_size, self.patch_size)
        x = nn.Conv(
            self.embed_dims,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="projection",
        )(x)
        return layer_norm(x, dtype=self.dtype, name="norm")


class PatchMerging(nn.Module):
    """2x2 neighborhood concat + LN + Linear(4C -> 2C, no bias)
    (reference: transformer_mmcv.py:213-316, unfold-based there).

    Concat order is position-major [(0,0), (0,1), (1,0), (1,1)] per channel
    — torch's nn.Unfold is channel-major; the checkpoint converter permutes
    the LN/reduction weights accordingly.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = corner_pad_to_multiple(x, 2, 2)
        x00 = x[:, 0::2, 0::2, :]
        x01 = x[:, 0::2, 1::2, :]
        x10 = x[:, 1::2, 0::2, :]
        x11 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x00, x01, x10, x11], axis=-1)  # (B, H/2, W/2, 4C)
        x = layer_norm(x, dtype=self.dtype, name="norm")
        return nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="reduction")(x)


class SwinBlockPair(nn.Module):
    """One unshifted + one shifted block — the repeating unit of a Swin stage
    (depths are even in every Swin config).  Scan-compatible body."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        kw = dict(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            window_size=self.window_size,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dtype=self.dtype,
        )
        x = SwinBlock(shift=False, name="block0", **kw)(x)
        x = SwinBlock(shift=True, name="block1", **kw)(x)
        return x, None


class SwinTransformer(nn.Module):
    """4-stage hierarchical backbone -> NHWC maps at strides 4/8/16/32
    (reference: codetr/swin.py:482-749).

    Stages run as nn.scan over block PAIRS with stacked params, so the deep
    stage-3 (18 blocks in Swin-L) traces/compiles one pair body instead of
    eighteen blocks — XLA compile time for the full model would otherwise be
    prohibitive."""

    cfg: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        c = self.cfg
        x = PatchEmbed(embed_dims=c.embed_dims, patch_size=c.patch_size, dtype=self.dtype, name="patch_embed")(x)

        outs = []
        dims = c.embed_dims
        for i, depth in enumerate(c.depths):
            assert depth % 2 == 0, "Swin stage depths must be even"
            # with_cp: remat the scanned pair (reference trains Swin-L with
            # torch.utils.checkpoint, swin.py:381-383) — activations of each
            # block pair are recomputed in the backward pass, trading ~33%
            # FLOPs for O(depth) -> O(1) stage activation memory
            body = nn.remat(SwinBlockPair) if c.with_cp else SwinBlockPair
            ScanStage = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=depth // 2,
            )
            x, _ = ScanStage(
                embed_dims=dims,
                num_heads=c.num_heads[i],
                feedforward_channels=c.mlp_ratio * dims,
                window_size=c.window_size,
                qkv_bias=c.qkv_bias,
                qk_scale=c.qk_scale,
                dtype=self.dtype,
                name=f"stages_{i}_blocks",
            )(x)
            if i in c.out_indices:
                outs.append(layer_norm(x, dtype=self.dtype, name=f"norm{i}"))
            if i < len(c.depths) - 1:
                x = PatchMerging(out_channels=2 * dims, dtype=self.dtype, name=f"stages_{i}_downsample")(x)
                dims *= 2
        return tuple(outs)
