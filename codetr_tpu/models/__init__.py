from codetr_tpu.models.channel_mapper import ChannelMapper  # noqa: F401
from codetr_tpu.models.co_dino_head import CoDINOHead  # noqa: F401
from codetr_tpu.models.codetr import CoDETR, build_codetr  # noqa: F401
from codetr_tpu.models.msda_module import MultiScaleDeformableAttention  # noqa: F401
from codetr_tpu.models.resnet import ResNet  # noqa: F401
from codetr_tpu.models.swin import SwinTransformer  # noqa: F401
from codetr_tpu.models.transformer import CoDinoTransformer  # noqa: F401
