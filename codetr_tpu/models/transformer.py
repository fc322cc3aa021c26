"""Co-DINO two-stage transformer, batch-first / static-shape for XLA.

Re-designs the reference transformer stack (codetr/transformer.py:
DetrTransformerEncoder :16, DinoTransformerDecoder :120,
DetrTransformerDecoderLayer :233, CoDinoTransformer :403; generic layer
assembly vendored from mmcv at codetr/transformer_mmcv.py:503-749) with the
fixed operation orders baked in:

- encoder layer:  MSDA self-attn -> LN -> FFN -> LN      (post-norm)
- decoder layer:  MHA self-attn -> LN -> MSDA cross-attn -> LN -> FFN -> LN

TPU-first differences from the reference:
- everything stays (batch, seq, dim); the reference permutes to seq-first for
  torch.nn.MultiheadAttention (transformer.py:532-533 etc.)
- spatial_shapes / level_start_index are compile-time constants, not tensors
- the branch-free multiplicative masking of the export path
  (make_encoder_output_proposals_export / apply_mask_to_proposal_and_memory,
  transformer.py:331-381) is expressed with jnp.where, which additionally
  avoids the reference's nan*0 propagation when a reference point exceeds 1
  in a padded region.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from codetr_tpu.config import TransformerConfig
from codetr_tpu.models.layers import (
    FFN,
    MlpParams,
    MultiheadAttention,
    layer_norm,
    mlp_apply,
)
from codetr_tpu.models.msda_module import MultiScaleDeformableAttention
from codetr_tpu.models.positional_encoding import gen_sineembed_for_position

Shapes = Tuple[Tuple[int, int], ...]


def get_valid_ratio(mask: jax.Array) -> jax.Array:
    """(bs, H, W) pad-mask -> (bs, 2) [w_ratio, h_ratio]
    (reference: get_valid_ratio, transformer.py:384-400)."""
    H, W = mask.shape[1], mask.shape[2]
    valid_h = jnp.sum(1.0 - mask[:, :, 0].astype(jnp.float32), axis=1)
    valid_w = jnp.sum(1.0 - mask[:, 0, :].astype(jnp.float32), axis=1)
    return jnp.stack([valid_w / W, valid_h / H], axis=-1)


def get_reference_points_qm(spatial_shapes: Shapes, valid_ratios: jax.Array) -> jax.Array:
    """Per-key normalized center points in Q-MINOR layout (bs, 2, K) xy
    (reference: get_reference_points, transformer.py:280-305).  The query
    axis stays minor so downstream coordinate math never materializes
    tile-padded tiny trailing dims."""
    refs = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        ref_y, ref_x = jnp.meshgrid(
            jnp.linspace(0.5, H - 0.5, H, dtype=jnp.float32),
            jnp.linspace(0.5, W - 0.5, W, dtype=jnp.float32),
            indexing="ij",
        )
        ref_y = ref_y.reshape(1, -1) / (valid_ratios[:, lvl, 1:2] * H)
        ref_x = ref_x.reshape(1, -1) / (valid_ratios[:, lvl, 0:1] * W)
        refs.append(jnp.stack((ref_x, ref_y), axis=1))  # (bs, 2, HW)
    return jnp.concatenate(refs, axis=2)


def get_reference_points(spatial_shapes: Shapes, valid_ratios: jax.Array) -> jax.Array:
    """Standard layout (bs, K, 2); derived from the q-minor form."""
    return get_reference_points_qm(spatial_shapes, valid_ratios).transpose(0, 2, 1)


def make_encoder_output_proposals(
    reference_points: jax.Array, spatial_shapes: Shapes
) -> jax.Array:
    """(bs, K, 2) -> unactivated (bs, K, 4) proposals with per-level widths
    0.05 * 2^lvl (reference: make_encoder_output_proposals_export,
    transformer.py:331-339; the level-id vector is a static constant here)."""
    lvl_ids = np.concatenate(
        [np.full(h * w, lvl, dtype=np.float32) for lvl, (h, w) in enumerate(spatial_shapes)]
    )
    width = jnp.asarray(0.05 * (2.0**lvl_ids), reference_points.dtype)  # (K,)
    bs, K, _ = reference_points.shape
    width = jnp.broadcast_to(width[None, :, None], (bs, K, 1))
    proposals = jnp.concatenate([reference_points, width, width], axis=-1)
    # inverse sigmoid; out-of-(0,1) entries produce non-finite values that are
    # masked out downstream (apply_mask_to_proposal_and_memory)
    return jnp.log(proposals / (1.0 - proposals))


def apply_mask_to_proposal_and_memory(
    output_proposals: jax.Array, memory: jax.Array, memory_padding_mask: jax.Array
):
    """Branch-free invalid-proposal masking
    (reference: apply_mask_to_proposal_and_memory, transformer.py:351-381):
    proposals outside logit range (+-4.6 ~= sigmoid in [0.01, 0.99]) or in
    padded keys are pushed to dtype-max; memory at those keys is zeroed."""
    in_bounds = jnp.all(
        (output_proposals > -4.6) & (output_proposals < 4.6), axis=-1, keepdims=True
    )
    valid = in_bounds & ~memory_padding_mask[..., None].astype(bool)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, output_proposals.dtype)
    proposals = jnp.where(valid, output_proposals, big)
    out_memory = jnp.where(valid, memory, 0.0)
    return proposals, out_memory


class DetrTransformerEncoderLayer(nn.Module):
    """MSDA self-attn -> LN -> FFN -> LN (config co_dino_5scale_r50_lsj:70-79).

    ``spatial_shapes`` is a static module field so the layer is scan-friendly
    (the 6 identical layers are driven by nn.scan with stacked params — the
    layer body, including its Pallas kernels, is traced and compiled once
    instead of six times)."""

    cfg: TransformerConfig
    spatial_shapes: Shapes
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(self, query, query_pos, key_padding_mask, reference_points):
        query = MultiScaleDeformableAttention(
            cfg=self.cfg.encoder_layer.attn, dtype=self.dtype, impl=self.msda_impl,
            grid_queries=True, name="self_attn"
        )(
            query,
            value=query,
            query_pos=query_pos,
            key_padding_mask=key_padding_mask,
            reference_points=reference_points,
            spatial_shapes=self.spatial_shapes,
        )
        query = layer_norm(query, dtype=self.dtype, name="norm1")
        query = FFN(
            feedforward_channels=self.cfg.encoder_layer.feedforward_channels,
            embed_dims=self.cfg.embed_dims,
            dtype=self.dtype,
            name="ffn",
        )(query)
        query = layer_norm(query, dtype=self.dtype, name="norm2")
        return query, None


class DetrTransformerDecoderLayer(nn.Module):
    """One scan step of the iterative-refinement decoder: query-pos sine
    embedding (shared ref_point_head weights arrive as a broadcast input) ->
    MHA self-attn -> LN -> MSDA cross-attn -> LN -> FFN -> LN -> box
    refinement with this step's reg-branch slice
    (config co_dino_5scale_r50_lsj:84-101; refinement transformer.py:223-226).

    The 6 layers are driven by ``nn.scan`` with stacked params — the body
    (MHA + MSDA + FFN + three LayerNorms + two MLP applications) is traced
    and compiled ONCE instead of six times, collapsing the decoder's
    many-small-kernels dispatch chain into one XLA while-loop (the round-2
    fixed-cost hotspot: ~22 ms calibrated at 608x608 where the whole TRT
    baseline is 13.4 ms).
    """

    cfg: TransformerConfig
    spatial_shapes: Shapes
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(self, carry, reg_slice, rph_tree, memory, key_padding_mask,
                 vr4, raw_table):
        query, reference_points = carry  # (bs,nq,C), (bs,nq,4) fp32 unactivated
        c = self.cfg

        ref_sig = jax.nn.sigmoid(reference_points.astype(jnp.float32))
        ref_input = ref_sig[:, :, None, :] * vr4[:, None]  # (bs, nq, L, 4)
        sine = gen_sineembed_for_position(
            ref_input[:, :, 0, :].astype(self.dtype), c.embed_dims // 2
        )  # (bs, nq, 2*embed)
        query_pos = mlp_apply(rph_tree, sine, dtype=self.dtype)

        query = MultiheadAttention(
            embed_dims=c.embed_dims,
            num_heads=c.decoder_layer.self_attn_heads,
            dtype=self.dtype,
            name="self_attn",
        )(query, query_pos=query_pos)
        query = layer_norm(query, dtype=self.dtype, name="norm1")
        query = MultiScaleDeformableAttention(
            cfg=c.decoder_layer.cross_attn, dtype=self.dtype, impl=self.msda_impl, name="cross_attn"
        )(
            query,
            value=memory,
            query_pos=query_pos,
            key_padding_mask=key_padding_mask,
            reference_points=ref_input.astype(self.dtype),
            spatial_shapes=self.spatial_shapes,
            raw_table=raw_table,
        )
        query = layer_norm(query, dtype=self.dtype, name="norm2")
        query = FFN(
            feedforward_channels=c.decoder_layer.feedforward_channels,
            embed_dims=c.embed_dims,
            dtype=self.dtype,
            name="ffn",
        )(query)
        query = layer_norm(query, dtype=self.dtype, name="norm3")

        # iterative refinement in unactivated space: per-layer refs equal
        # reg_branches[lid](state) + inverse_sigmoid(ref_in) — exactly the
        # per-layer coordinate predictions mmdet's DINO head supervises
        reference_points = (
            mlp_apply(reg_slice, query, dtype=self.dtype).astype(jnp.float32)
            + reference_points
        )
        return (query, reference_points), (query, reference_points)


class DinoTransformerDecoder(nn.Module):
    """Iterative box-refinement decoder
    (reference: DinoTransformerDecoder, transformer.py:120-230), scanned."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "auto"
    # shared raw-memory corner table for cross-attention: a measured
    # NEGATIVE result at 1920x1280 (ROUND5_NOTES.md session 2: table build
    # 11.3 ms + 7.9 ms/layer vs the pair gather's 5.1 ms/layer — raw
    # interpolation fetches all 256 channels per tap where the per-head
    # pair path fetches only that head's 32 projected channels).  Kept
    # opt-in for future geometries; exact either way.
    dectab: bool = False

    @nn.compact
    def __call__(
        self,
        query,  # (bs, nq, C)
        memory,  # (bs, K, C)
        key_padding_mask,  # (bs, K)
        reference_points,  # (bs, nq, 4) unactivated fp32
        spatial_shapes: Shapes,
        valid_ratios,  # (bs, L, 2)
        reg_stack,  # MlpParams tree stacked on axis 0 (num_decoder_layers, ...)
    ):
        c = self.cfg
        rph_tree = MlpParams(
            in_dim=2 * c.embed_dims, hidden_dim=c.embed_dims, output_dim=c.embed_dims,
            num_layers=2, name="ref_point_head",
        )()
        vr4 = jnp.concatenate([valid_ratios, valid_ratios], axis=-1)  # (bs, L, 4)

        # shared raw-memory corner table for the 6 layers' cross-attention
        # (ops/msda_dectab.py): built ONCE outside the scan; each layer
        # gathers 1 row/tap and applies its own value_proj afterward.
        raw_table = None
        if self.dectab and self.msda_impl == "auto":
            from codetr_tpu.ops.msda_dectab import build_raw_quad_table

            mem_t = memory.astype(self.dtype)
            if key_padding_mask is not None:
                unmask = 1.0 - key_padding_mask.astype(self.dtype)
                mem_z = mem_t * unmask[..., None]
            else:
                unmask = jnp.ones(mem_t.shape[:2], self.dtype)
                mem_z = mem_t
            mem_aug = jnp.concatenate([mem_z, unmask[..., None]], axis=-1)
            raw_table = build_raw_quad_table(mem_aug, spatial_shapes)

        ScanDecoder = nn.scan(
            DetrTransformerDecoderLayer,
            # "intermediates" rides the scan axis so MSDA sampling-coord
            # captures (calibration, ops/msda_calibrate.calibrate_model)
            # stack per-layer; inert unless apply() makes it mutable
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast),
            length=c.num_decoder_layers,
        )
        (output, reference_points), (inter_states, inter_refs) = ScanDecoder(
            cfg=c,
            spatial_shapes=spatial_shapes,
            dtype=self.dtype,
            msda_impl=self.msda_impl,
            name="layers",
        )(
            (query, reference_points.astype(jnp.float32)),
            reg_stack,
            rph_tree,
            memory,
            key_padding_mask,
            vr4,
            raw_table,
        )

        # the shared final LayerNorm is applied to every intermediate state
        # for aux supervision (mmdet DinoTransformerDecoder return_intermediate)
        stacked = layer_norm(
            inter_states, dtype=self.dtype, name="norm"
        )  # (n_layers, bs, nq, C)
        output = stacked[-1]
        return output, reference_points, stacked, inter_refs


class CoDinoTransformer(nn.Module):
    """Flatten levels -> encoder -> two-stage proposal selection -> decoder
    (reference: CoDinoTransformer.forward, transformer.py:480-582)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        mlvl_feats: Sequence[jax.Array],  # NHWC per level
        mlvl_masks: Sequence[jax.Array],  # (bs, h, w) pad masks
        mlvl_pos_embeds: Sequence[jax.Array],  # (bs, h, w, C)
        reg_stack,  # stacked MlpParams tree, leading axis = num_decoder_layers
        reg_branch_enc,  # callable: encoder-stage reg branch (index num_decoder_layers)
        cls_branch_enc,  # callable: encoder-stage cls branch (index num_decoder_layers)
    ):
        c = self.cfg
        bs = mlvl_feats[0].shape[0]
        spatial_shapes: Shapes = tuple((f.shape[1], f.shape[2]) for f in mlvl_feats)

        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0), (c.num_feature_levels, c.embed_dims), jnp.float32
        )

        feat_flat = jnp.concatenate(
            [f.reshape(bs, -1, c.embed_dims) for f in mlvl_feats], axis=1
        )
        mask_flat = jnp.concatenate([m.reshape(bs, -1) for m in mlvl_masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(bs, -1, c.embed_dims) + level_embeds[lvl].astype(self.dtype)
                for lvl, p in enumerate(mlvl_pos_embeds)
            ],
            axis=1,
        )

        valid_ratios = jnp.stack([get_valid_ratio(m) for m in mlvl_masks], axis=1)  # (bs, L, 2)
        ref_qm = get_reference_points_qm(spatial_shapes, valid_ratios)  # (bs, 2, K)
        reference_points = ref_qm.transpose(0, 2, 1)  # (bs, K, 2) for proposals
        # q-major per-level encoder reference points (bs, K, L, 2), fp32 —
        # the packed-coordinate MSDA pipeline (models/msda_module.py) keeps
        # every coordinate tensor in the projections' natural q-major layout
        ref_by_level = (
            reference_points[:, :, None, :] * valid_ratios[:, None, :, :]
        )

        # encoder: nn.scan over 6 identical layers (stacked params; the
        # Pallas-heavy body compiles once, not six times)
        ScanEncoder = nn.scan(
            DetrTransformerEncoderLayer,
            variable_axes={"params": 0, "intermediates": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            length=c.num_encoder_layers,
        )
        memory, _ = ScanEncoder(
            cfg=c,
            spatial_shapes=spatial_shapes,
            dtype=self.dtype,
            msda_impl=self.msda_impl,
            name="encoder_layers",
        )(
            feat_flat,
            pos_flat,
            mask_flat,
            ref_by_level,  # fp32 q-major (bs, K, L, 2)
        )

        # --- two-stage proposal generation (transformer.py:549-562) ---
        output_proposals = make_encoder_output_proposals(
            reference_points.astype(jnp.float32), spatial_shapes
        )
        output_proposals, output_memory = apply_mask_to_proposal_and_memory(
            output_proposals, memory, mask_flat
        )
        output_memory = nn.Dense(
            c.embed_dims, dtype=self.dtype, param_dtype=jnp.float32, name="enc_output"
        )(output_memory)
        output_memory = layer_norm(output_memory, dtype=self.dtype, name="enc_output_norm")

        # branch index num_decoder_layers (==6) serves the encoder stage
        # (reference: transformer.py:553-557, co_dino_head.py:103-113)
        enc_class = cls_branch_enc(output_memory)  # (bs, K, num_classes)
        enc_coord_unact = reg_branch_enc(output_memory) + output_proposals

        topk = c.two_stage_num_proposals
        cls_max = jnp.max(enc_class.astype(jnp.float32), axis=-1)  # (bs, K)
        _, topk_idx = jax.lax.top_k(cls_max, topk)  # (bs, topk)
        topk_coords_unact = jnp.take_along_axis(
            enc_coord_unact, topk_idx[..., None], axis=1
        )  # (bs, topk, 4)
        topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (topk, c.embed_dims), jnp.float32
        )
        query = jnp.broadcast_to(query_embed[None].astype(self.dtype), (bs, topk, c.embed_dims))

        final_state, final_refs_unact, inter_states, inter_refs = DinoTransformerDecoder(
            cfg=c, dtype=self.dtype, msda_impl=self.msda_impl, name="decoder"
        )(
            query,
            memory,
            key_padding_mask=mask_flat,
            reference_points=topk_coords_unact,
            spatial_shapes=spatial_shapes,
            valid_ratios=valid_ratios,
            reg_stack=reg_stack,
        )
        aux = {
            "inter_states": inter_states,  # (n_layers, bs, nq, C) after norm
            "inter_refs_unact": inter_refs,  # (n_layers, bs, nq, 4)
            "init_refs_unact": topk_coords_unact,  # (bs, nq, 4)
            "enc_class": enc_class,  # (bs, K, num_classes)
            "enc_coord_unact": enc_coord_unact,  # (bs, K, 4)
        }
        return final_state, final_refs_unact, aux
