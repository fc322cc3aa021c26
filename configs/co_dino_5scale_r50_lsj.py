# Co-DINO R50 5-scale, LSJ variant — alias of the base inference config.
# Reference equivalent: configs/co_dino_5scale_r50_lsj_8xb2_1x_coco.py.
#
# The reference splits R50 into an LSJ (large-scale-jitter) base and a
# non-LSJ child (configs/co_dino_5scale_r50_8xb2_1x_coco.py) that differ
# only in TRAINING augmentation (use_lsj, batch_augments, train_pipeline) —
# the inference graph is identical.  This framework keeps one inference-path
# base (co_dino_5scale_r50.py, mirroring the LSJ file's model dict) and both
# named variants for config-surface parity.
_base_ = ["co_dino_5scale_r50.py"]

# LSJ training metadata (documented for parity; the inference model ignores
# training-only sections exactly as the reference's CoDETR class does,
# reference codetr.py:51-64)
use_lsj = True
