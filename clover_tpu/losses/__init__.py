from clover_tpu.losses.classification import (  # noqa: F401
    IGNORE_INDEX,
    bce_with_logits,
    cross_entropy,
    label_smoothing_cross_entropy,
    masked_lm_cross_entropy,
    masked_lm_focal_loss,
    softmax_focal_multiclass,
)
from clover_tpu.losses.contrastive import (  # noqa: F401
    cos_norm,
    exclusive_nce_with_ranking,
    margin_ranking_loss,
    norm_softmax_loss,
    sim_matrix,
)
