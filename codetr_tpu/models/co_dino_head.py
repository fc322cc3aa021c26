"""CoDINO detection head (reference: codetr/co_dino_head.py:17-210).

Owns the sine positional encoding, the CoDinoTransformer, and the 7 cloned
classification / regression branches (6 decoder layers + 1 encoder stage,
reference co_dino_head.py:103-113).  Produces the final
(boxes[bs,300,4] xyxy-in-pixels, scores[bs,300], labels[bs,300]) exactly like
the reference forward (co_dino_head.py:120-210).

The reference's unused-at-inference ``downsample`` conv (co_dino_head.py:115,
consumed only by training-time aux heads) is not instantiated.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from codetr_tpu.config import HeadConfig
from codetr_tpu.models.layers import (
    DenseParams,
    Mlp,
    MlpParams,
    dense_apply,
    mlp_apply,
    nearest_resize_mask,
)
from codetr_tpu.models.positional_encoding import sine_positional_encoding
from codetr_tpu.models.transformer import CoDinoTransformer


def _tree_slice(tree, i):
    return jax.tree.map(lambda a: a[i], tree)


class CoDINOHead(nn.Module):
    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "auto"

    def setup(self):
        c = self.cfg
        nd = c.transformer.num_decoder_layers
        E = c.transformer.embed_dims
        # branches 0..nd-1 (the decoder layers) are STACKED param banks: the
        # reg bank is consumed one slice per nn.scan step inside the decoder,
        # the cls bank is applied to the stacked intermediate states; branch
        # index nd serves the encoder stage and stays a separate module
        # (reference: 7 clones, co_dino_head.py:103-113)
        self.cls_bank = DenseParams(in_dim=E, out_dim=c.num_classes, stack=nd, name="cls_branches")
        self.cls_branch_enc = nn.Dense(
            c.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name=f"cls_branches_{nd}"
        )
        self.reg_bank = MlpParams(
            in_dim=E, hidden_dim=E, output_dim=4, num_layers=c.num_reg_fcs + 1,
            stack=nd, name="reg_branches",
        )
        self.reg_branch_enc = Mlp(
            hidden_dim=E, output_dim=4, num_layers=c.num_reg_fcs + 1,
            dtype=self.dtype, name=f"reg_branches_{nd}",
        )
        self.transformer = CoDinoTransformer(
            cfg=c.transformer, dtype=self.dtype, msda_impl=self.msda_impl, name="transformer"
        )

    def _run_transformer(self, mlvl_feats, img_masks):
        c = self.cfg
        mlvl_masks = []
        mlvl_pos = []
        for feat in mlvl_feats:
            h, w = feat.shape[1], feat.shape[2]
            m = nearest_resize_mask(img_masks, h, w)
            m = (m != 0)
            mlvl_masks.append(m)
            mlvl_pos.append(sine_positional_encoding(m, c.positional_encoding, dtype=self.dtype))

        return self.transformer(
            mlvl_feats,
            mlvl_masks,
            mlvl_pos,
            reg_stack=self.reg_bank(),
            reg_branch_enc=self.reg_branch_enc,
            cls_branch_enc=self.cls_branch_enc,
        )

    def raw_predictions(self, mlvl_feats, img_masks):
        """Training-path outputs: per-decoder-layer class logits and box
        predictions plus the encoder (two-stage) predictions — the tensors
        mmdet's DINO head supervises (all_layers_outputs_classes/coords)."""
        _, _, aux = self._run_transformer(mlvl_feats, img_masks)
        states = aux["inter_states"]  # (nl, bs, nq, C)
        cls = self.cls_bank()
        all_cls = (
            jnp.einsum(
                "lbqc,lcn->lbqn",
                states.astype(self.dtype),
                cls["kernel"].astype(self.dtype),
            )
            + cls["bias"].astype(self.dtype)[:, None, None, :]
        ).astype(jnp.float32)  # (nl, bs, nq, ncls) logits
        all_coords = jax.nn.sigmoid(
            aux["inter_refs_unact"].astype(jnp.float32)
        )  # (nl, bs, nq, 4) cxcywh in [0,1]
        return {
            "all_cls_logits": all_cls,
            "all_coords": all_coords,
            "enc_cls_logits": aux["enc_class"].astype(jnp.float32),
            "enc_coords": jax.nn.sigmoid(aux["enc_coord_unact"].astype(jnp.float32)),
        }

    def __call__(
        self,
        mlvl_feats: Sequence[jax.Array],  # NHWC feature maps
        img_masks: jax.Array,  # (bs, H, W) float, 1 = padded
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        c = self.cfg
        image_height, image_width = img_masks.shape[-2:]

        final_state, final_refs_unact, _ = self._run_transformer(mlvl_feats, img_masks)

        lvl = c.transformer.num_decoder_layers - 1
        outputs_classes = dense_apply(
            _tree_slice(self.cls_bank(), lvl), final_state, dtype=self.dtype
        )  # (bs, nq, num_classes)
        tmp = mlp_apply(_tree_slice(self.reg_bank(), lvl), final_state, dtype=self.dtype)
        tmp = tmp + final_refs_unact
        outputs_coords = jax.nn.sigmoid(tmp.astype(jnp.float32))  # (bs, nq, 4) cxcywh

        bs, nq, _ = outputs_coords.shape
        assert c.use_sigmoid, "softmax classification head not used by any reference config"
        cls_score = jax.nn.sigmoid(outputs_classes.astype(jnp.float32))  # (bs, nq, ncls)
        scores, indexes = jax.lax.top_k(cls_score.reshape(bs, -1), c.max_per_img)
        det_labels = indexes % c.num_classes
        bbox_index = indexes // c.num_classes
        bbox_pred = jnp.take_along_axis(outputs_coords, bbox_index[..., None], axis=1)

        # cxcywh -> xyxy, scale to pixels, clamp (co_dino_head.py:205-209)
        cx, cy, w, h = jnp.split(bbox_pred, 4, axis=-1)
        boxes = jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        scale = jnp.asarray(
            [image_width, image_height, image_width, image_height], jnp.float32
        )
        boxes = boxes * scale
        boxes = jnp.clip(
            boxes,
            jnp.zeros((4,), jnp.float32),
            scale,
        )
        return boxes, scores, det_labels
