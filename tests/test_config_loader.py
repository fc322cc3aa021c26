"""Config-file loader: _base_ inheritance, _delete_, dict->typed mapping."""

import os

from codetr_tpu.config import co_dino_swin_l
from codetr_tpu.utils.config_loader import load_config_file, load_dict_config

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def test_base_inheritance_and_delete():
    cfg = load_dict_config(os.path.join(CONFIGS, "co_dino_5scale_swin_l.py"))
    model = cfg["model"]
    # _delete_ replaced the resnet backbone entirely
    assert model["backbone"]["type"] == "SwinTransformer"
    assert "depth" not in model["backbone"]
    # non-deleted sections merged from base
    assert model["neck"]["in_channels"] == [192, 384, 768, 1536]
    assert model["neck"]["out_channels"] == 256  # inherited
    assert model["query_head"]["num_query"] == 900


def test_swin_file_equals_preset():
    from_file = load_config_file(os.path.join(CONFIGS, "co_dino_5scale_swin_l.py"))
    preset = co_dino_swin_l()
    assert from_file.swin == preset.swin
    assert from_file.neck == preset.neck
    assert from_file.head.transformer == preset.head.transformer
    assert from_file.head.num_classes == preset.head.num_classes


def test_r50_file_loads():
    cfg = load_config_file(os.path.join(CONFIGS, "co_dino_5scale_r50.py"))
    assert cfg.backbone_type == "resnet"
    assert cfg.neck.in_channels == (256, 512, 1024, 2048)
