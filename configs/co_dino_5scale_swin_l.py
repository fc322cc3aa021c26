# Co-DINO Swin-L 5-scale (o365 -> COCO) — inference-path config.
# Reference equivalent: configs/co_dino_5scale_swin_l_16xb1_16e_o365tococo.py.
_base_ = ["co_dino_5scale_r50.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="SwinTransformer",
        pretrain_img_size=384,
        embed_dims=192,
        depths=[2, 2, 18, 2],
        num_heads=[6, 12, 24, 48],
        window_size=12,
        mlp_ratio=4,
        qkv_bias=True,
        qk_scale=None,
        patch_norm=True,
        out_indices=(0, 1, 2, 3),
    ),
    neck=dict(in_channels=[192, 384, 768, 1536]),
)
