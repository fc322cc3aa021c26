from codetr_tpu.ops.msda import (  # noqa: F401
    multi_scale_deformable_attention,
    multi_scale_deformable_attention_reference,
)
from codetr_tpu.ops.nms import batched_nms, nms  # noqa: F401
