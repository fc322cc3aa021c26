"""Top-level CoDETR model: backbone -> neck -> query head
(reference: codetr/codetr.py:15-90, build_CoDETR :129-170).

Input convention is TPU-native NHWC: ``batch_inputs`` is (bs, H, W, 3)
normalized images; ``img_masks`` is (bs, H, W) with 1.0 in the padded region
(identical mask semantics to the reference, export.py:126-128).  Returns
(boxes[bs, max_per_img, 4] xyxy pixels, scores, labels).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from codetr_tpu.config import CoDETRConfig
from codetr_tpu.models.channel_mapper import ChannelMapper
from codetr_tpu.models.co_dino_head import CoDINOHead
from codetr_tpu.models.resnet import ResNet
from codetr_tpu.models.swin import SwinTransformer


class CoDETR(nn.Module):
    cfg: CoDETRConfig
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "auto"

    def setup(self):
        if self.cfg.backbone_type == "swin":
            self.backbone = SwinTransformer(cfg=self.cfg.swin, dtype=self.dtype, name="backbone")
        elif self.cfg.backbone_type == "resnet":
            self.backbone = ResNet(cfg=self.cfg.resnet, dtype=self.dtype, name="backbone")
        else:
            raise ValueError(f"unknown backbone {self.cfg.backbone_type!r}")
        self.neck = ChannelMapper(cfg=self.cfg.neck, dtype=self.dtype, name="neck")
        self.query_head = CoDINOHead(
            cfg=self.cfg.head, dtype=self.dtype, msda_impl=self.msda_impl, name="query_head"
        )

    def __call__(
        self, batch_inputs: jax.Array, img_masks: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        feats = self.features(batch_inputs)
        return self.detect(feats, img_masks)

    def features(self, batch_inputs: jax.Array):
        """Backbone + neck (separately jittable: the monolithic Swin-L graph
        exceeds what the remote AOT compile transport tolerates)."""
        feats = self.backbone(batch_inputs.astype(self.dtype))
        return self.neck(feats)

    def detect(self, feats, img_masks: jax.Array):
        """Transformer head on neck features (separately jittable)."""
        return self.query_head(feats, img_masks)

    def train_outputs(self, batch_inputs: jax.Array, img_masks: jax.Array):
        """Pre-topk per-layer predictions for the training losses
        (parallel/losses.py): per-decoder-layer + encoder-stage class logits
        and cxcywh boxes."""
        feats = self.features(batch_inputs)
        return self.query_head.raw_predictions(feats, img_masks)


def build_codetr(
    cfg: CoDETRConfig,
    weights_file: Optional[str] = None,
    *,
    dtype=jnp.float32,
    msda_impl: str = "auto",
    input_shape: Tuple[int, int] = (608, 608),
    batch_size: int = 1,
    seed: int = 0,
):
    """Build the model and its params (reference: build_CoDETR, codetr.py:129).

    With ``weights_file`` (an mmdet .pth), params are converted from the torch
    checkpoint; otherwise they are randomly initialized at ``input_shape``.
    Returns (model, params).
    """
    model = CoDETR(cfg=cfg, dtype=dtype, msda_impl=msda_impl)
    if weights_file is not None:
        from codetr_tpu.utils.checkpoint import load_torch_checkpoint

        params = load_torch_checkpoint(weights_file, cfg)
        return model, params
    H, W = input_shape
    dummy = jnp.zeros((batch_size, H, W, 3), dtype)
    masks = jnp.zeros((batch_size, H, W), jnp.float32)
    # jit the init: eager init dispatches every op individually, which is
    # pathologically slow over a remote-device transport
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), dummy, masks)
    return model, params
