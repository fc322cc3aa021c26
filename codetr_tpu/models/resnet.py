"""ResNet backbone (inference), TPU-native NHWC.

The reference delegates to mmdet's registry-built ResNet
(configs/co_dino_5scale_r50_lsj_8xb2_1x_coco.py:30-39: depth 50,
out_indices (0,1,2,3), frozen BN, "pytorch" style = stride-2 on the 3x3 conv).
Re-implemented from scratch: BatchNorm is folded to its inference affine form
(scale/bias/mean/var parameters applied directly — there is no training-mode
BN in this inference framework, matching norm_eval=True in the config).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from codetr_tpu.config import ResNetConfig

BN_EPS = 1e-5


class FrozenBatchNorm(nn.Module):
    """Inference BatchNorm: y = (x - mean) / sqrt(var + eps) * gamma + beta."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + BN_EPS) * gamma
        return (x.astype(jnp.float32) * inv + (beta - mean * inv)).astype(self.dtype)


def _conv(x, feats, k, s, dtype, name, padding=None):
    if padding is None:
        padding = [(k // 2, k // 2)] * 2
    return nn.Conv(
        feats, (k, k), strides=(s, s), padding=padding, use_bias=False,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with identity/downsample shortcut."""

    mid_channels: int
    out_channels: int
    stride: int
    has_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = _conv(x, self.mid_channels, 1, 1, self.dtype, "conv1")
        y = FrozenBatchNorm(self.mid_channels, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(y, self.mid_channels, 3, self.stride, self.dtype, "conv2")
        y = FrozenBatchNorm(self.mid_channels, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(y, self.out_channels, 1, 1, self.dtype, "conv3")
        y = FrozenBatchNorm(self.out_channels, self.dtype, name="bn3")(y)
        if self.has_downsample:
            identity = _conv(x, self.out_channels, 1, self.stride, self.dtype, "downsample_conv")
            identity = FrozenBatchNorm(self.out_channels, self.dtype, name="downsample_bn")(identity)
        return nn.relu(identity + y)


class ResNet(nn.Module):
    cfg: ResNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        c = self.cfg
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        x = _conv(x, c.stem_channels, 7, 2, self.dtype, "conv1")
        x = FrozenBatchNorm(c.stem_channels, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        in_planes = c.stem_channels
        for stage, num_blocks in enumerate(c.stage_blocks):
            mid = c.base_channels * 2**stage
            out_ch = mid * 4
            for b in range(num_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(
                    mid_channels=mid,
                    out_channels=out_ch,
                    stride=stride,
                    has_downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in c.out_indices:
                outs.append(x)
        return tuple(outs)
