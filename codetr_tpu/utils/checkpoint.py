"""Torch .pth -> flax params conversion.

The reference loads mmdet checkpoints with mmengine's
``_load_checkpoint/_load_checkpoint_to_model`` (codetr/codetr.py:165-166) and
supports original-Swin-repo checkpoints through ``swin_converter`` key
remapping + bicubic re-interpolation of relative-position-bias tables
(codetr/swin.py:658-723, 752-803).  This module provides the same capability
for the TPU build:

- ``load_torch_checkpoint(path, cfg)``: mmdet CoDETR .pth -> flax params
- ``convert_state_dict(state_dict, cfg)``: the pure mapping (testable without
  files)
- ``swin_original_to_mmdet(state_dict)``: original Swin-repo key remapping
  (the swin_converter analog)
- bias-table bicubic interpolation when the configured window size differs
  from the checkpoint's

Layout rules (torch -> flax):
- Linear  (out, in)          -> kernel (in, out): transpose
- Conv2d  (out, in, kh, kw)  -> kernel (kh, kw, in, out): transpose(2, 3, 1, 0)
- LayerNorm/GroupNorm weight -> scale
- BatchNorm running stats    -> FrozenBatchNorm mean/var params
- torch MHA packed in_proj   -> split q/k/v Dense
- PatchMerging unfold input is channel-major (c*4 + pos); ours is
  position-major (pos*C + c): permute reduction/norm rows accordingly.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from codetr_tpu.config import CoDETRConfig

__all__ = [
    "load_torch_checkpoint",
    "convert_state_dict",
    "swin_original_to_mmdet",
    "resize_bias_table",
]


def _t(x):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(np.transpose(x))


def _conv(x):  # torch OIHW -> flax HWIO
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


class _ParamTree:
    def __init__(self):
        self.tree: Dict = {}

    def put(self, path: str, value: np.ndarray):
        node = self.tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)


def _unfold_to_position_major(w: np.ndarray, c_in: int, axis: int = 0) -> np.ndarray:
    """Permute a weight whose ``axis`` indexes torch-unfold channels
    (c * 4 + pos, pos row-major over the 2x2 block) into position-major
    (pos * C + c) used by our PatchMerging concat."""
    shape = list(w.shape)
    assert shape[axis] == 4 * c_in
    w = np.moveaxis(w, axis, 0).reshape(c_in, 4, *shape[:axis], *shape[axis + 1 :])
    w = np.swapaxes(w, 0, 1).reshape(4 * c_in, *shape[:axis], *shape[axis + 1 :])
    return np.moveaxis(w, 0, axis)


def resize_bias_table(table: np.ndarray, wh_new: int, ww_new: int) -> np.ndarray:
    """Bicubic-resize a ((2Wh-1)(2Ww-1), nH) relative-position-bias table to a
    new window size (reference: swin.py:706-720)."""
    L1, nH = table.shape
    s1 = int(round(L1**0.5))
    assert s1 * s1 == L1, "only square windows supported for resize"
    s2h, s2w = 2 * wh_new - 1, 2 * ww_new - 1
    if (s2h, s2w) == (s1, s1):
        return table
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(table.astype(np.float32)).permute(1, 0).reshape(1, nH, s1, s1)
    t = F.interpolate(t, size=(s2h, s2w), mode="bicubic", align_corners=False)
    return t.reshape(nH, s2h * s2w).permute(1, 0).numpy()


def swin_original_to_mmdet(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remap original-Swin-repo checkpoint keys to the mmdet layout the main
    converter consumes (the swin_converter analog, codetr/swin.py:752-803).

    Note the original repo's PatchMerging concatenates [x00, x10, x01, x11]
    (row-major over H then W) while mmdet's unfold order implies
    [x00, x01, x10, x11]; the 4-block permutation [0, 2, 1, 3] below matches
    the reference's correct_unfold_* fixups (swin.py:756-766).
    """
    out = {}
    for k, v in sd.items():
        if k.startswith("head"):
            continue
        nk, nv = k, v
        if k.startswith("layers"):
            if "attn." in k:
                nk = k.replace("attn.", "attn.w_msa.")
            elif "mlp.fc1." in k:
                nk = k.replace("mlp.fc1.", "ffn.layers.0.0.")
            elif "mlp.fc2." in k:
                nk = k.replace("mlp.fc2.", "ffn.layers.1.")
            elif "downsample" in k:
                if "reduction." in k:
                    o, i = v.shape
                    nv = v.reshape(o, 4, i // 4)[:, [0, 2, 1, 3], :].transpose(0, 2, 1).reshape(o, i)
                elif "norm." in k:
                    i = v.shape[0]
                    nv = v.reshape(4, i // 4)[[0, 2, 1, 3], :].transpose(1, 0).reshape(i)
            nk = nk.replace("layers", "stages", 1)
        elif k.startswith("patch_embed") and "proj" in k:
            nk = k.replace("proj", "projection")
        out["backbone." + nk] = np.asarray(nv)
    return out


def _convert_msda(tree: _ParamTree, sd, src: str, dst: str):
    for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        k = _t(sd[f"{src}.{name}.weight"])
        b = np.asarray(sd[f"{src}.{name}.bias"])
        if name == "sampling_offsets":
            # torch emits (h, L, P, 2)-interleaved xy offsets; this
            # framework's projection layout is deinterleaved
            # [x-block | y-block] (models/msda_module.py:_grid_offset_bias,
            # keeps the packed-coordinate pipeline in flat lane-axis ops).
            # The permutation is simply [even cols | odd cols].
            k = np.concatenate([k[:, 0::2], k[:, 1::2]], axis=1)
            b = np.concatenate([b[0::2], b[1::2]])
        tree.put(f"{dst}/{name}/kernel", k)
        tree.put(f"{dst}/{name}/bias", b)


def _convert_ln(tree: _ParamTree, sd, src: str, dst: str):
    tree.put(f"{dst}/scale", sd[f"{src}.weight"])
    tree.put(f"{dst}/bias", sd[f"{src}.bias"])


def _convert_ffn(tree: _ParamTree, sd, src: str, dst: str):
    # torch FFN: layers.0.0 (Linear) / layers.1 (Linear) (transformer_mmcv.py:464-475)
    tree.put(f"{dst}/fc1/kernel", _t(sd[f"{src}.layers.0.0.weight"]))
    tree.put(f"{dst}/fc1/bias", sd[f"{src}.layers.0.0.bias"])
    tree.put(f"{dst}/fc2/kernel", _t(sd[f"{src}.layers.1.weight"]))
    tree.put(f"{dst}/fc2/bias", sd[f"{src}.layers.1.bias"])


def _convert_swin(tree: _ParamTree, sd, cfg: CoDETRConfig):
    sc = cfg.swin
    tree.put("backbone/patch_embed/projection/kernel", _conv(sd["backbone.patch_embed.projection.weight"]))
    tree.put("backbone/patch_embed/projection/bias", sd["backbone.patch_embed.projection.bias"])
    _convert_ln(tree, sd, "backbone.patch_embed.norm", "backbone/patch_embed/norm")

    def swin_block(sub: _ParamTree, src: str, dst: str):
        _convert_ln(sub, sd, f"{src}.norm1", f"{dst}/norm1")
        _convert_ln(sub, sd, f"{src}.norm2", f"{dst}/norm2")
        w = f"{src}.attn.w_msa"
        table = np.asarray(sd[f"{w}.relative_position_bias_table"])
        table = resize_bias_table(table, sc.window_size, sc.window_size)
        sub.put(f"{dst}/attn/w_msa/relative_position_bias_table", table)
        sub.put(f"{dst}/attn/w_msa/qkv/kernel", _t(sd[f"{w}.qkv.weight"]))
        if f"{w}.qkv.bias" in sd:
            sub.put(f"{dst}/attn/w_msa/qkv/bias", sd[f"{w}.qkv.bias"])
        sub.put(f"{dst}/attn/w_msa/proj/kernel", _t(sd[f"{w}.proj.weight"]))
        sub.put(f"{dst}/attn/w_msa/proj/bias", sd[f"{w}.proj.bias"])
        _convert_ffn(sub, sd, f"{src}.ffn", f"{dst}/ffn")

    import jax

    dims = sc.embed_dims
    for i, depth in enumerate(sc.depths):
        # stages are scanned over block pairs: leaves stacked on axis 0
        pair_trees = []
        for j in range(depth // 2):
            sub = _ParamTree()
            swin_block(sub, f"backbone.stages.{i}.blocks.{2 * j}", "block0")
            swin_block(sub, f"backbone.stages.{i}.blocks.{2 * j + 1}", "block1")
            pair_trees.append(sub.tree)
        stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *pair_trees)
        tree.tree.setdefault("backbone", {})[f"stages_{i}_blocks"] = stacked
        if i < len(sc.depths) - 1:
            src = f"backbone.stages.{i}.downsample"
            dst = f"backbone/stages_{i}_downsample"
            norm_w = _unfold_to_position_major(np.asarray(sd[f"{src}.norm.weight"]), dims)
            norm_b = _unfold_to_position_major(np.asarray(sd[f"{src}.norm.bias"]), dims)
            tree.put(f"{dst}/norm/scale", norm_w)
            tree.put(f"{dst}/norm/bias", norm_b)
            red = _unfold_to_position_major(np.asarray(sd[f"{src}.reduction.weight"]), dims, axis=1)
            tree.put(f"{dst}/reduction/kernel", _t(red))
            dims *= 2
    for i in sc.out_indices:
        _convert_ln(tree, sd, f"backbone.norm{i}", f"backbone/norm{i}")


def _convert_resnet(tree: _ParamTree, sd, cfg: CoDETRConfig):
    rc = cfg.resnet

    def bn(src, dst):
        tree.put(f"{dst}/scale", sd[f"{src}.weight"])
        tree.put(f"{dst}/bias", sd[f"{src}.bias"])
        tree.put(f"{dst}/mean", sd[f"{src}.running_mean"])
        tree.put(f"{dst}/var", sd[f"{src}.running_var"])

    tree.put("backbone/conv1/kernel", _conv(sd["backbone.conv1.weight"]))
    bn("backbone.bn1", "backbone/bn1")
    for stage, num_blocks in enumerate(rc.stage_blocks):
        for b in range(num_blocks):
            src = f"backbone.layer{stage + 1}.{b}"
            dst = f"backbone/layer{stage + 1}_{b}"
            for j in (1, 2, 3):
                tree.put(f"{dst}/conv{j}/kernel", _conv(sd[f"{src}.conv{j}.weight"]))
                bn(f"{src}.bn{j}", f"{dst}/bn{j}")
            if b == 0:
                tree.put(f"{dst}/downsample_conv/kernel", _conv(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")


def _convert_neck(tree: _ParamTree, sd, cfg: CoDETRConfig):
    for i in range(len(cfg.neck.in_channels)):
        tree.put(f"neck/convs_{i}_conv/kernel", _conv(sd[f"neck.convs.{i}.conv.weight"]))
        tree.put(f"neck/convs_{i}_conv/bias", sd[f"neck.convs.{i}.conv.bias"])
        _convert_ln(tree, sd, f"neck.convs.{i}.gn", f"neck/convs_{i}_gn")
    for j in range(cfg.neck.num_outs - len(cfg.neck.in_channels)):
        tree.put(f"neck/extra_convs_{j}_conv/kernel", _conv(sd[f"neck.extra_convs.{j}.conv.weight"]))
        tree.put(f"neck/extra_convs_{j}_conv/bias", sd[f"neck.extra_convs.{j}.conv.bias"])
        _convert_ln(tree, sd, f"neck.extra_convs.{j}.gn", f"neck/extra_convs_{j}_gn")


def _convert_head(tree: _ParamTree, sd, cfg: CoDETRConfig):
    tc = cfg.head.transformer
    nd = tc.num_decoder_layers
    # branches 0..nd-1 are STACKED banks (the decoder scan consumes one reg
    # slice per step; the cls bank applies to the stacked states) — reference
    # clones at co_dino_head.py:103-113.  Branch nd (encoder stage) stays a
    # separate module.
    tree.put(
        "query_head/cls_branches/kernel",
        np.stack([_t(sd[f"query_head.cls_branches.{i}.weight"]) for i in range(nd)]),
    )
    tree.put(
        "query_head/cls_branches/bias",
        np.stack([np.asarray(sd[f"query_head.cls_branches.{i}.bias"]) for i in range(nd)]),
    )
    tree.put(f"query_head/cls_branches_{nd}/kernel", _t(sd[f"query_head.cls_branches.{nd}.weight"]))
    tree.put(f"query_head/cls_branches_{nd}/bias", sd[f"query_head.cls_branches.{nd}.bias"])
    # torch reg branch Sequential: Linear@0, ReLU@1, Linear@2, ReLU@3, Linear@4
    for li, ti in enumerate(range(0, 2 * cfg.head.num_reg_fcs + 1, 2)):
        tree.put(
            f"query_head/reg_branches/layers_{li}/kernel",
            np.stack([_t(sd[f"query_head.reg_branches.{i}.{ti}.weight"]) for i in range(nd)]),
        )
        tree.put(
            f"query_head/reg_branches/layers_{li}/bias",
            np.stack([np.asarray(sd[f"query_head.reg_branches.{i}.{ti}.bias"]) for i in range(nd)]),
        )
        tree.put(
            f"query_head/reg_branches_{nd}/layers_{li}/kernel",
            _t(sd[f"query_head.reg_branches.{nd}.{ti}.weight"]),
        )
        tree.put(
            f"query_head/reg_branches_{nd}/layers_{li}/bias",
            sd[f"query_head.reg_branches.{nd}.{ti}.bias"],
        )

    t = "query_head.transformer"
    dst = "query_head/transformer"
    tree.put(f"{dst}/level_embeds", sd[f"{t}.level_embeds"])
    tree.put(f"{dst}/enc_output/kernel", _t(sd[f"{t}.enc_output.weight"]))
    tree.put(f"{dst}/enc_output/bias", sd[f"{t}.enc_output.bias"])
    _convert_ln(tree, sd, f"{t}.enc_output_norm", f"{dst}/enc_output_norm")
    tree.put(f"{dst}/query_embed", sd[f"{t}.query_embed.weight"])

    # encoder AND decoder layers are scanned (nn.scan): leaves stacked axis 0
    def put_stack(dest: str, n_layers: int, src_fmt: str, fn):
        trees = []
        for l in range(n_layers):
            sub = _ParamTree()
            fn(sub, src_fmt.format(l))
            trees.append(sub.tree)
        import jax

        stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)
        node = tree.tree
        parts = f"{dst}/{dest}".split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = stacked

    def enc_layer(sub, src):
        _convert_msda(sub, sd, f"{src}.attentions.0", "self_attn")
        _convert_ln(sub, sd, f"{src}.norms.0", "norm1")
        _convert_ln(sub, sd, f"{src}.norms.1", "norm2")
        _convert_ffn(sub, sd, f"{src}.ffns.0", "ffn")

    put_stack("encoder_layers", tc.num_encoder_layers, f"{t}.encoder.layers.{{}}", enc_layer)

    def dec_layer(sub, src):
        E = tc.embed_dims
        w_in = np.asarray(sd[f"{src}.attentions.0.attn.in_proj_weight"])
        b_in = np.asarray(sd[f"{src}.attentions.0.attn.in_proj_bias"])
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            sub.put(f"self_attn/{name}/kernel", _t(w_in[j * E : (j + 1) * E]))
            sub.put(f"self_attn/{name}/bias", b_in[j * E : (j + 1) * E])
        sub.put(f"self_attn/out_proj/kernel", _t(sd[f"{src}.attentions.0.attn.out_proj.weight"]))
        sub.put(f"self_attn/out_proj/bias", sd[f"{src}.attentions.0.attn.out_proj.bias"])
        _convert_msda(sub, sd, f"{src}.attentions.1", "cross_attn")
        _convert_ln(sub, sd, f"{src}.norms.0", "norm1")
        _convert_ln(sub, sd, f"{src}.norms.1", "norm2")
        _convert_ln(sub, sd, f"{src}.norms.2", "norm3")
        _convert_ffn(sub, sd, f"{src}.ffns.0", "ffn")

    put_stack("decoder/layers", tc.num_decoder_layers, f"{t}.decoder.layers.{{}}", dec_layer)

    # decoder ref_point_head: Sequential(Linear@0, ReLU@1, Linear@2)
    for li, ti in enumerate((0, 2)):
        tree.put(
            f"{dst}/decoder/ref_point_head/layers_{li}/kernel",
            _t(sd[f"{t}.decoder.ref_point_head.{ti}.weight"]),
        )
        tree.put(
            f"{dst}/decoder/ref_point_head/layers_{li}/bias",
            sd[f"{t}.decoder.ref_point_head.{ti}.bias"],
        )
    _convert_ln(tree, sd, f"{t}.decoder.norm", f"{dst}/decoder/norm")


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: CoDETRConfig) -> Dict:
    """mmdet CoDETR state_dict (numpy values) -> flax params pytree.

    ``sd`` is used as-is (no copy): load_torch_checkpoint passes a
    read-tracking dict so its load report can list unconsumed keys —
    rebuilding the dict here silently detached that tracking (the report
    then claimed "loaded 0 params" for every checkpoint)."""
    tree = _ParamTree()
    if cfg.backbone_type == "swin":
        _convert_swin(tree, sd, cfg)
    else:
        _convert_resnet(tree, sd, cfg)
    _convert_neck(tree, sd, cfg)
    _convert_head(tree, sd, cfg)
    return {"params": tree.tree}


def load_torch_checkpoint(path: str, cfg: CoDETRConfig, *, convert_swin_original: bool = False):
    """Load an mmdet .pth and convert (reference: build_CoDETR weights path,
    codetr.py:165-166).  Values are loaded on CPU via torch and returned as a
    numpy-backed flax params tree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    sd = {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}
    if convert_swin_original:
        sd = swin_original_to_mmdet(sd)

    class _Tracking(dict):
        """Records key reads so the load report can list unconsumed keys."""

        def __init__(self, base):
            super().__init__(base)
            self.read = set()

        def __getitem__(self, k):
            self.read.add(k)
            return super().__getitem__(k)

    tsd = _Tracking(sd)
    params = convert_state_dict(tsd, cfg)

    from codetr_tpu.utils.logging import log_load_report

    # aux training heads exist in mmdet checkpoints but this model never
    # builds them (reference codetr.py:51-64 ignores them the same way)
    train_only = ("rpn_head.", "roi_head.", "bbox_head.", "dn_", "label_emb")
    unexpected = [
        k for k in sd
        if k not in tsd.read and not k.startswith(train_only)
    ]
    log_load_report(len(tsd.read), [], unexpected, path)
    return params


def get_dataset_meta(path: str) -> dict:
    """Dataset metadata from checkpoint meta (reference: get_dataset_meta,
    codetr.py:93-126); falls back to COCO classes."""
    import torch

    from codetr_tpu.utils.coco import COCO_CLASSES

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta = ckpt.get("meta", {})
    if "dataset_meta" in meta:
        dataset_meta = {k.lower(): v for k, v in meta["dataset_meta"].items()}
    elif "CLASSES" in meta:
        dataset_meta = {"classes": meta["CLASSES"]}
    else:
        dataset_meta = {"classes": COCO_CLASSES}
    dataset_meta["palette"] = "coco"
    return dataset_meta
