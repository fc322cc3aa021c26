"""Self-contained PyTorch mirror of the reference Co-DETR forward.

The reference validates its export against a live PyTorch baseline
(/root/reference/export.py:267-275).  This module plays that role for the TPU
build: a full-model torch implementation — no mmdet/mmcv — whose module tree
reproduces the mmdet checkpoint key schema, so ``model.state_dict()`` feeds
``codetr_tpu.utils.checkpoint.convert_state_dict`` directly and end-to-end
numeric parity proves every converter permutation (qkv packing, unfold
ordering, packed-MHA split, branch indexing, norm placement).

Behavioral spec (file:line into /root/reference):
- Swin backbone: codetr/swin.py:23-386 (WindowMSA rel-pos bias, shifted
  windows with -100 additive mask, patch embed/merging via unfold)
- ChannelMapper: mmdet semantics per config co_dino_5scale_r50_lsj:40-47
- SinePositionalEncoding: codetr/positional_encoding.py:58-93
- MSDA module + pure-torch sampling: codetr/multi_scale_deformable_attention.py:117-218,
  codetr/ops.py:129-186 (grid_sample bilinear/zeros/align_corners=False)
- CoDinoTransformer two-stage flow: codetr/transformer.py:480-582
- Decoder w/ iterative refinement + sine query embed: codetr/transformer.py:120-230
- CoDINOHead topk decode: codetr/co_dino_head.py:120-210
- Layer op orders: codetr/transformer_mmcv.py:649-749

This is a TEST ORACLE: written for clarity and key-schema fidelity, not speed.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from codetr_tpu.config import CoDETRConfig


# ---------------------------------------------------------------- backbone


def _rel_position_index(ws: int) -> torch.Tensor:
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    ).flatten(1)  # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    return (rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)


class _WindowMSA(nn.Module):
    def __init__(self, dims: int, heads: int, ws: int, qkv_bias: bool = True):
        super().__init__()
        self.heads, self.ws = heads, ws
        self.scale = (dims // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads)
        )
        self.register_buffer("rel_index", _rel_position_index(ws), persistent=False)
        self.qkv = nn.Linear(dims, 3 * dims, bias=qkv_bias)
        self.proj = nn.Linear(dims, dims)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        q, k, v = (
            self.qkv(x)
            .reshape(B, N, 3, self.heads, C // self.heads)
            .permute(2, 0, 3, 1, 4)
            .unbind(0)
        )
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rel_index.reshape(-1)]
        attn = attn + bias.reshape(N, N, -1).permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B // nW, nW, self.heads, N, N) + mask[None, :, None]
            attn = attn.reshape(B, self.heads, N, N)
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _ShiftWindowMSA(nn.Module):
    def __init__(self, dims: int, heads: int, ws: int, shift: int, qkv_bias: bool):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.w_msa = _WindowMSA(dims, heads, ws, qkv_bias)

    def forward(self, x, hw):
        B, L, C = x.shape
        H, W = hw
        ws = self.ws
        x = x.reshape(B, H, W, C)
        x = F.pad(x, (0, 0, 0, (-W) % ws, 0, (-H) % ws))
        Hp, Wp = x.shape[1], x.shape[2]
        mask = None
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            region = torch.zeros(Hp, Wp)
            cuts = (slice(0, -ws), slice(-ws, -self.shift), slice(-self.shift, None))
            n = 0
            for hs in cuts:
                for wcut in cuts:
                    region[hs, wcut] = n
                    n += 1
            rw = (
                region.reshape(Hp // ws, ws, Wp // ws, ws)
                .permute(0, 2, 1, 3)
                .reshape(-1, ws * ws)
            )
            mask = torch.where(rw[:, None, :] != rw[:, :, None], -100.0, 0.0)
        win = (
            x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(-1, ws * ws, C)
        )
        win = self.w_msa(win, mask)
        x = (
            win.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp, Wp, C)
        )
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        return x[:, :H, :W].reshape(B, L, C)


class _GeluFFN(nn.Module):
    """state-dict schema: ffn.layers.0.0 / ffn.layers.1 (mmcv FFN)."""

    def __init__(self, dims: int, hidden: int, act: str = "gelu"):
        super().__init__()
        act_m = nn.GELU() if act == "gelu" else nn.ReLU()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dims, hidden), act_m), nn.Linear(hidden, dims)
        )

    def forward(self, x, identity=None):
        return (x if identity is None else identity) + self.layers(x)


class _SwinBlock(nn.Module):
    def __init__(self, dims, heads, ws, shift, mlp_ratio, qkv_bias):
        super().__init__()
        self.norm1 = nn.LayerNorm(dims)
        self.attn = nn.Module()
        self.attn.w_msa = _WindowMSA(dims, heads, ws, qkv_bias)  # key schema
        self._sw = _ShiftWindowMSA.__new__(_ShiftWindowMSA)  # share compute path
        nn.Module.__init__(self._sw)
        self._sw.ws, self._sw.shift = ws, (ws // 2 if shift else 0)
        self._sw.w_msa = self.attn.w_msa
        self.norm2 = nn.LayerNorm(dims)
        self.ffn = _GeluFFN(dims, mlp_ratio * dims)

    def forward(self, x, hw):
        x = x + self._sw(self.norm1(x), hw)
        return self.ffn(self.norm2(x), identity=x)


class _PatchMerging(nn.Module):
    """unfold(2,2) channel-major -> LN -> Linear (transformer_mmcv.py:213-316)."""

    def __init__(self, c_in):
        super().__init__()
        self.norm = nn.LayerNorm(4 * c_in)
        self.reduction = nn.Linear(4 * c_in, 2 * c_in, bias=False)

    def forward(self, x, hw):
        B, L, C = x.shape
        H, W = hw
        x = x.transpose(1, 2).reshape(B, C, H, W)
        x = F.pad(x, (0, W % 2, 0, H % 2))
        Hp, Wp = x.shape[2], x.shape[3]
        x = F.unfold(x, kernel_size=2, stride=2).transpose(1, 2)  # (B, L', 4C)
        return self.reduction(self.norm(x)), (Hp // 2, Wp // 2)


class _SwinStage(nn.Module):
    def __init__(self, dims, heads, depth, ws, mlp_ratio, qkv_bias, last):
        super().__init__()
        self.blocks = nn.ModuleList(
            _SwinBlock(dims, heads, ws, i % 2 == 1, mlp_ratio, qkv_bias)
            for i in range(depth)
        )
        self.downsample = None if last else _PatchMerging(dims)

    def forward(self, x, hw):
        for b in self.blocks:
            x = b(x, hw)
        if self.downsample is None:
            return x, hw, x, hw
        xd, hwd = self.downsample(x, hw)
        return xd, hwd, x, hw


class TorchSwin(nn.Module):
    def __init__(self, cfg: CoDETRConfig):
        super().__init__()
        sc = cfg.swin
        self.cfg = sc
        self.patch_embed = nn.Module()
        self.patch_embed.projection = nn.Conv2d(
            sc.in_channels, sc.embed_dims, sc.patch_size, sc.patch_size
        )
        self.patch_embed.norm = nn.LayerNorm(sc.embed_dims)
        dims = sc.embed_dims
        self.stages = nn.ModuleList()
        for i, depth in enumerate(sc.depths):
            self.stages.append(
                _SwinStage(
                    dims, sc.num_heads[i], depth, sc.window_size, sc.mlp_ratio,
                    sc.qkv_bias, last=i == len(sc.depths) - 1,
                )
            )
            if i < len(sc.depths) - 1:
                dims *= 2
        for i in sc.out_indices:
            self.add_module(f"norm{i}", nn.LayerNorm(sc.num_features[i]))

    def forward(self, x):
        p = self.cfg.patch_size
        _, _, H, W = x.shape
        x = F.pad(x, (0, (-W) % p, 0, (-H) % p))
        x = self.patch_embed.projection(x)
        hw = (x.shape[2], x.shape[3])
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for i, stage in enumerate(self.stages):
            x, hw, out, out_hw = stage(x, hw)
            if i in self.cfg.out_indices:
                out = getattr(self, f"norm{i}")(out)
                outs.append(
                    out.reshape(-1, *out_hw, self.cfg.num_features[i])
                    .permute(0, 3, 1, 2)
                    .contiguous()
                )
        return outs


class TorchNeck(nn.Module):
    def __init__(self, cfg: CoDETRConfig):
        super().__init__()
        nc = cfg.neck

        def block(c_in, k, s):
            m = nn.Module()
            m.conv = nn.Conv2d(c_in, nc.out_channels, k, s, padding=k // 2)
            m.gn = nn.GroupNorm(nc.num_groups, nc.out_channels)
            return m

        self.convs = nn.ModuleList(block(c, nc.kernel_size, 1) for c in nc.in_channels)
        self.extra_convs = nn.ModuleList(
            block(nc.in_channels[-1] if j == 0 else nc.out_channels, 3, 2)
            for j in range(nc.num_outs - len(nc.in_channels))
        )

    def forward(self, feats):
        outs = [m.gn(m.conv(f)) for m, f in zip(self.convs, feats)]
        for j, m in enumerate(self.extra_convs):
            src = feats[-1] if j == 0 else outs[-1]
            outs.append(m.gn(m.conv(src)))
        return outs


# ------------------------------------------------------------- transformer


def sine_pos_encoding(mask: torch.Tensor, num_feats: int, temperature: float,
                      scale: float = 2 * math.pi, eps: float = 1e-6):
    """codetr/positional_encoding.py:58-93 (normalize=True path)."""
    not_mask = 1 - mask.int()
    y = not_mask.cumsum(1, dtype=torch.float32)
    x = not_mask.cumsum(2, dtype=torch.float32)
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    px, py = x[..., None] / dim_t, y[..., None] / dim_t
    B, H, W = mask.shape
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).reshape(B, H, W, -1)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).reshape(B, H, W, -1)
    return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)


def sine_embed_for_boxes(pos: torch.Tensor, pos_feat: int):
    """codetr/transformer.py:156-190, batch-first. pos: (bs, nq, 4)."""
    scale = 2 * math.pi
    dim_t = torch.arange(pos_feat, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / pos_feat)

    def emb(c):
        p = c[..., None] * scale / dim_t
        return torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), dim=3).flatten(2)

    return torch.cat([emb(pos[..., i]) for i in (1, 0, 2, 3)], dim=2)  # y,x,w,h


class TorchMSDA(nn.Module):
    """codetr/multi_scale_deformable_attention.py:117-218, batch-first, with
    the pure-torch sampling path (codetr/ops.py:129-186)."""

    def __init__(self, mc):
        super().__init__()
        self.c = mc
        E = mc.embed_dims
        n = mc.num_heads * mc.num_levels * mc.num_points
        self.sampling_offsets = nn.Linear(E, 2 * n)
        self.attention_weights = nn.Linear(E, n)
        self.value_proj = nn.Linear(E, E)
        self.output_proj = nn.Linear(E, E)

    def forward(self, query, value, identity, query_pos, key_padding_mask,
                reference_points, spatial_shapes):
        c = self.c
        bs, nq, _ = query.shape
        if query_pos is not None:
            query = query + query_pos
        v = self.value_proj(value)
        if key_padding_mask is not None:
            v = v.masked_fill(key_padding_mask[..., None], 0.0)
        v = v.reshape(bs, -1, c.num_heads, c.embed_dims // c.num_heads)
        off = self.sampling_offsets(query).reshape(
            bs, nq, c.num_heads, c.num_levels, c.num_points, 2
        )
        w = self.attention_weights(query).reshape(
            bs, nq, c.num_heads, c.num_levels * c.num_points
        )
        w = w.softmax(-1).reshape(bs, nq, c.num_heads, c.num_levels, c.num_points)
        if reference_points.shape[-1] == 2:
            normalizer = torch.tensor(
                [[wl, hl] for hl, wl in spatial_shapes], dtype=torch.float32
            )
            loc = reference_points[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + off / c.num_points * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        # grid_sample per level (ops.py:157-186)
        d = c.embed_dims // c.num_heads
        splits = [h * wl for h, wl in spatial_shapes]
        v_list = v.split(splits, dim=1)
        grids = 2 * loc - 1
        sampled = []
        for lvl, (hl, wl) in enumerate(spatial_shapes):
            v_l = v_list[lvl].flatten(2).transpose(1, 2).reshape(bs * c.num_heads, d, hl, wl)
            g_l = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
            sampled.append(
                F.grid_sample(v_l, g_l, mode="bilinear", padding_mode="zeros", align_corners=False)
            )
        w_flat = w.transpose(1, 2).reshape(bs * c.num_heads, 1, nq, -1)
        out = (torch.stack(sampled, dim=-2).flatten(-2) * w_flat).sum(-1)
        out = out.reshape(bs, c.num_heads * d, nq).transpose(1, 2)
        return identity + self.output_proj(out)


class _EncoderLayer(nn.Module):
    def __init__(self, tc):
        super().__init__()
        self.attentions = nn.ModuleList([TorchMSDA(tc.encoder_layer.attn)])
        self.norms = nn.ModuleList([nn.LayerNorm(tc.embed_dims) for _ in range(2)])
        self.ffns = nn.ModuleList(
            [_GeluFFN(tc.embed_dims, tc.encoder_layer.feedforward_channels, act="relu")]
        )

    def forward(self, q, pos, mask, ref, shapes):
        q = self.attentions[0](q, q, q, pos, mask, ref, shapes)
        q = self.norms[0](q)
        q = self.ffns[0](q)
        return self.norms[1](q)


class _MHAWrap(nn.Module):
    def __init__(self, dims, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(dims, heads, batch_first=True)

    def forward(self, q, pos):
        out = self.attn(q + pos, q + pos, q, need_weights=False)[0]
        return q + out


class _DecoderLayer(nn.Module):
    def __init__(self, tc):
        super().__init__()
        self.attentions = nn.ModuleList(
            [_MHAWrap(tc.embed_dims, tc.decoder_layer.self_attn_heads),
             TorchMSDA(tc.decoder_layer.cross_attn)]
        )
        self.norms = nn.ModuleList([nn.LayerNorm(tc.embed_dims) for _ in range(3)])
        self.ffns = nn.ModuleList(
            [_GeluFFN(tc.embed_dims, tc.decoder_layer.feedforward_channels, act="relu")]
        )

    def forward(self, q, memory, pos, mask, ref, shapes):
        q = self.norms[0](self.attentions[0](q, pos))
        q = self.norms[1](self.attentions[1](q, memory, q, pos, mask, ref, shapes))
        return self.norms[2](self.ffns[0](q))


class TorchCoDinoTransformer(nn.Module):
    def __init__(self, tc):
        super().__init__()
        self.tc = tc
        self.level_embeds = nn.Parameter(torch.zeros(tc.num_feature_levels, tc.embed_dims))
        self.enc_output = nn.Linear(tc.embed_dims, tc.embed_dims)
        self.enc_output_norm = nn.LayerNorm(tc.embed_dims)
        self.query_embed = nn.Embedding(tc.two_stage_num_proposals, tc.embed_dims)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            _EncoderLayer(tc) for _ in range(tc.num_encoder_layers)
        )
        self.decoder = nn.Module()
        self.decoder.layers = nn.ModuleList(
            _DecoderLayer(tc) for _ in range(tc.num_decoder_layers)
        )
        E = tc.embed_dims
        self.decoder.ref_point_head = nn.Sequential(
            nn.Linear(2 * E, E), nn.ReLU(), nn.Linear(E, E)
        )
        self.decoder.norm = nn.LayerNorm(E)

    def forward(self, feats, masks, pos_embeds, reg_branches, cls_branches):
        tc = self.tc
        shapes = [(f.shape[2], f.shape[3]) for f in feats]
        feat_flat = torch.cat([f.flatten(2).transpose(1, 2) for f in feats], 1)
        mask_flat = torch.cat([m.flatten(1) for m in masks], 1)
        pos_flat = torch.cat(
            [
                p.flatten(2).transpose(1, 2) + self.level_embeds[i].reshape(1, 1, -1)
                for i, p in enumerate(pos_embeds)
            ],
            1,
        )
        valid_ratios = torch.stack(
            [
                torch.stack(
                    [
                        (~m[:, 0, :]).sum(1).float() / m.shape[2],
                        (~m[:, :, 0]).sum(1).float() / m.shape[1],
                    ],
                    -1,
                )
                for m in masks
            ],
            1,
        )  # (bs, L, 2) [w, h]

        refs = []
        for lvl, (H, W) in enumerate(shapes):
            ry, rx = torch.meshgrid(
                torch.linspace(0.5, H - 0.5, H), torch.linspace(0.5, W - 0.5, W),
                indexing="ij",
            )
            ry = ry.reshape(1, -1) / (valid_ratios[:, lvl, 1].reshape(-1, 1) * H)
            rx = rx.reshape(1, -1) / (valid_ratios[:, lvl, 0].reshape(-1, 1) * W)
            refs.append(torch.stack((rx, ry), -1))
        reference_points = torch.cat(refs, 1)  # (bs, K, 2)
        ref_by_level = reference_points[:, :, None] * valid_ratios[:, None]

        memory = feat_flat
        for layer in self.encoder.layers:
            memory = layer(memory, pos_flat, mask_flat, ref_by_level, shapes)

        lvl_rep = torch.cat(
            [torch.full((h * w,), float(l)) for l, (h, w) in enumerate(shapes)]
        )
        width = (0.05 * 2.0**lvl_rep).expand(memory.shape[0], -1).unsqueeze(-1)
        proposals = torch.cat([reference_points, width, width], dim=-1)
        proposals = torch.log(proposals / (1 - proposals))
        # where-based masking (the TPU build's semantics): identical to the
        # reference's multiplicative masking (transformer.py:351-381) on valid
        # keys, but avoids its nan*0 propagation for padded keys whose
        # reference point exceeds 1 (log of a negative above)
        in_bounds = ((proposals > -4.6) & (proposals < 4.6)).all(-1, keepdim=True)
        valid = in_bounds & ~mask_flat.unsqueeze(-1)
        proposals = torch.where(valid, proposals, torch.finfo(torch.float32).max)
        out_memory = torch.where(valid, memory, 0.0)
        out_memory = self.enc_output_norm(self.enc_output(out_memory))

        nl = tc.num_decoder_layers
        enc_class = cls_branches[nl](out_memory)
        enc_coord = reg_branches[nl](out_memory) + proposals
        topk_idx = torch.topk(enc_class.max(-1)[0], tc.two_stage_num_proposals, dim=1)[1]
        topk_coords = torch.gather(enc_coord, 1, topk_idx.unsqueeze(-1).repeat(1, 1, 4))

        bs = memory.shape[0]
        query = self.query_embed.weight[None].repeat(bs, 1, 1)
        refs_unact = topk_coords
        output = query
        for lid, layer in enumerate(self.decoder.layers):
            ref_in = refs_unact[:, :, None].sigmoid() * torch.cat(
                [valid_ratios, valid_ratios], -1
            )[:, None]
            sine = sine_embed_for_boxes(ref_in[:, :, 0, :], tc.embed_dims // 2)
            qpos = self.decoder.ref_point_head(sine)
            output = layer(output, memory, qpos, mask_flat, ref_in, shapes)
            refs_unact = reg_branches[lid](output) + refs_unact
        return self.decoder.norm(output), refs_unact


class TorchCoDETR(nn.Module):
    """Full oracle: (batch_inputs NCHW, img_masks) -> (boxes, scores, labels)."""

    def __init__(self, cfg: CoDETRConfig):
        super().__init__()
        assert cfg.backbone_type == "swin", "oracle supports the Swin flagship"
        self.cfg = cfg
        self.backbone = TorchSwin(cfg)
        self.neck = TorchNeck(cfg)
        hc = cfg.head
        qh = nn.Module()
        E = hc.transformer.embed_dims
        num_pred = hc.transformer.num_decoder_layers + 1
        qh.cls_branches = nn.ModuleList(
            nn.Linear(E, hc.num_classes) for _ in range(num_pred)
        )

        def reg():
            layers = []
            for _ in range(hc.num_reg_fcs):
                layers += [nn.Linear(E, E), nn.ReLU()]
            return nn.Sequential(*layers, nn.Linear(E, 4))

        qh.reg_branches = nn.ModuleList(reg() for _ in range(num_pred))
        qh.transformer = TorchCoDinoTransformer(hc.transformer)
        self.query_head = qh

    def features(self, batch_inputs):
        return self.neck(self.backbone(batch_inputs))

    def forward(self, batch_inputs, img_masks):
        hc = self.cfg.head
        feats = self.features(batch_inputs)
        H, W = img_masks.shape[-2:]
        masks, poss = [], []
        for f in feats:
            m = (
                F.interpolate(img_masks[:, None], size=f.shape[-2:])
                .to(torch.bool)
                .squeeze(1)
            )
            masks.append(m)
            poss.append(
                sine_pos_encoding(
                    m, hc.positional_encoding.num_feats, hc.positional_encoding.temperature
                )
            )
        final_state, final_refs = self.query_head.transformer(
            feats, masks, poss,
            reg_branches=self.query_head.reg_branches,
            cls_branches=self.query_head.cls_branches,
        )
        lvl = hc.transformer.num_decoder_layers - 1
        cls = self.query_head.cls_branches[lvl](final_state)
        coords = (self.query_head.reg_branches[lvl](final_state) + final_refs).sigmoid()
        bs = coords.shape[0]
        scores, idx = torch.topk(cls.sigmoid().reshape(bs, -1), hc.max_per_img, dim=-1)
        labels = idx % hc.num_classes
        box_idx = idx // hc.num_classes
        pred = torch.gather(coords, 1, box_idx.unsqueeze(-1).expand(-1, -1, 4))
        cx, cy, w, h = pred.unbind(-1)
        boxes = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        boxes = boxes * torch.tensor([W, H, W, H], dtype=torch.float32)
        boxes[..., 0::2] = boxes[..., 0::2].clamp(0, W)
        boxes[..., 1::2] = boxes[..., 1::2].clamp(0, H)
        return boxes, scores, labels


def init_oracle(model: TorchCoDETR, seed: int = 0) -> TorchCoDETR:
    """Deterministic non-degenerate init: xavier-ish random weights everywhere
    plus the reference's MSDA grid-offset bias
    (multi_scale_deformable_attention.py:97-115) so sampling stays sane."""
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        if p.dim() > 1:
            nn.init.xavier_uniform_(p, generator=g)
        else:
            with torch.no_grad():
                p.uniform_(-0.05, 0.05, generator=g)
    for m in model.modules():
        if isinstance(m, TorchMSDA):
            c = m.c
            thetas = torch.arange(c.num_heads, dtype=torch.float32) * (
                2 * math.pi / c.num_heads
            )
            grid = torch.stack([thetas.cos(), thetas.sin()], -1)
            grid = (grid / grid.abs().max(-1, keepdim=True)[0]).reshape(
                c.num_heads, 1, 1, 2
            ).repeat(1, c.num_levels, c.num_points, 1)
            for i in range(c.num_points):
                grid[:, :, i] *= i + 1
            with torch.no_grad():
                m.sampling_offsets.weight.mul_(0.02)
                m.sampling_offsets.bias.copy_(grid.reshape(-1))
                m.attention_weights.weight.mul_(0.1)
        if isinstance(m, _WindowMSA):
            with torch.no_grad():
                m.relative_position_bias_table.normal_(0, 0.02, generator=g)
    with torch.no_grad():
        model.query_head.transformer.level_embeds.normal_(0, 1, generator=g)
        model.query_head.transformer.query_embed.weight.normal_(0, 1, generator=g)
    return model.eval()


def oracle_state_dict_numpy(model: TorchCoDETR) -> dict:
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
