from clover_tpu.models.bert import BertConfig, BertTextEncoder  # noqa: F401
from clover_tpu.models.finetune import CloverFinetune, FinetuneConfig  # noqa: F401
from clover_tpu.models.fusion import CrossModalTransformer, FusionConfig  # noqa: F401
from clover_tpu.models.heads import (  # noqa: F401
    ITMHead,
    MLMHead,
    NCEHeadForMM,
    NCEHeadForText,
    NCEHeadForVision,
    QAMCHead,
    QAOEHead,
)
from clover_tpu.models.pretrain import CloverPretrain, PretrainConfig  # noqa: F401
from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D  # noqa: F401
