"""ChannelMapper neck: map 4 backbone levels to a uniform channel width and
append one extra stride-2 level (5-scale).

The reference builds mmdet's ChannelMapper from the registry
(codetr/codetr.py:54; config co_dino_5scale_r50_lsj:40-47: kernel_size=1,
out_channels=256, GN(32), act_cfg=None, num_outs=5) — re-implemented from
scratch, NHWC: per level 1x1 conv + GroupNorm(32); the extra level is a
3x3 stride-2 conv + GroupNorm applied to the *last input* feature map.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from codetr_tpu.config import NeckConfig
from codetr_tpu.models.layers import group_norm


class ChannelMapper(nn.Module):
    cfg: NeckConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jax.Array, ...]) -> Tuple[jax.Array, ...]:
        c = self.cfg
        assert len(feats) == len(c.in_channels)
        outs = []
        for i, x in enumerate(feats):
            y = nn.Conv(
                c.out_channels,
                (c.kernel_size, c.kernel_size),
                padding="SAME" if c.kernel_size > 1 else "VALID",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"convs_{i}_conv",
            )(x)
            y = group_norm(y, c.num_groups, dtype=self.dtype, name=f"convs_{i}_gn")
            outs.append(y)
        for j in range(c.num_outs - len(feats)):
            src = feats[-1] if j == 0 else outs[-1]
            y = nn.Conv(
                c.out_channels,
                (3, 3),
                strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"extra_convs_{j}_conv",
            )(src)
            y = group_norm(y, c.num_groups, dtype=self.dtype, name=f"extra_convs_{j}_gn")
            outs.append(y)
        return tuple(outs)
