# Co-DINO R50 5-scale — inference-path config (mmengine-style python dict;
# the reference's equivalent is configs/co_dino_5scale_r50_lsj_8xb2_1x_coco.py,
# training-only sections omitted because the inference model ignores them).

num_classes = 80

model = dict(
    type="CoDETR",
    data_preprocessor=dict(
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        bgr_to_rgb=True,
    ),
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
    ),
    neck=dict(
        type="ChannelMapper",
        in_channels=[256, 512, 1024, 2048],
        kernel_size=1,
        out_channels=256,
        norm_cfg=dict(type="GN", num_groups=32),
        num_outs=5,
    ),
    query_head=dict(
        type="CoDINOHead",
        num_query=900,
        num_classes=num_classes,
        transformer=dict(
            type="CoDinoTransformer",
            with_coord_feat=False,
            num_co_heads=2,
            num_feature_levels=5,
            encoder=dict(
                type="DetrTransformerEncoder",
                num_layers=6,
                transformerlayers=dict(
                    type="BaseTransformerLayer",
                    attn_cfgs=dict(
                        type="MultiScaleDeformableAttention",
                        embed_dims=256,
                        num_levels=5,
                        dropout=0.0,
                    ),
                    feedforward_channels=2048,
                    operation_order=("self_attn", "norm", "ffn", "norm"),
                ),
            ),
            decoder=dict(
                type="DinoTransformerDecoder",
                num_layers=6,
                transformerlayers=dict(
                    type="DetrTransformerDecoderLayer",
                    attn_cfgs=[
                        dict(type="MultiheadAttention", embed_dims=256, num_heads=8, dropout=0.0),
                        dict(type="MultiScaleDeformableAttention", embed_dims=256, num_levels=5, dropout=0.0),
                    ],
                    feedforward_channels=2048,
                    operation_order=("self_attn", "norm", "cross_attn", "norm", "ffn", "norm"),
                ),
            ),
        ),
        positional_encoding=dict(
            type="SinePositionalEncoding", num_feats=128, temperature=20, normalize=True
        ),
    ),
    test_cfg=[
        dict(max_per_img=300, nms=dict(type="soft_nms", iou_threshold=0.8)),
    ],
)
