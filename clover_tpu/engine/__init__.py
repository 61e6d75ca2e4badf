from clover_tpu.engine.checkpoint import CheckpointManager  # noqa: F401
from clover_tpu.engine.eval_loop import run_qa_eval, run_retrieval_eval  # noqa: F401
from clover_tpu.engine.optim import (  # noqa: F401
    cosine_warmup_schedule,
    freeze_by_prefix,
    freeze_mask_from_cfg,
    make_optimizer,
    weight_decay_mask,
)
from clover_tpu.engine.steps import (  # noqa: F401
    make_embed_eval_step,
    make_pretrain_train_step,
    make_qa_eval_step,
    make_qa_train_step,
    make_retrieval_train_step,
)
from clover_tpu.engine.train_state import TrainState  # noqa: F401
from clover_tpu.engine.trainer import Trainer, interleave_loaders  # noqa: F401
