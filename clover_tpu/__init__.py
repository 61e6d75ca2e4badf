"""clover_tpu — a TPU-native video-language pretraining + finetuning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Clover
(LeeYN-43/Clover, arXiv:2207.07885): tri-modal video-text alignment
pretraining and retrieval / VQA / multiple-choice finetuning, designed
TPU-first:

- one jitted, mesh-sharded train step per task (GSPMD data parallelism,
  optional fsdp/tensor axes) instead of DDP + NCCL;
- bf16 compute / fp32 master params instead of fp16 loss scaling;
- fused on-device preprocessing; Pallas shifted-window attention;
- orbax checkpointing of a single pytree.

Reference layer map: /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from clover_tpu.config import Config, load_config  # noqa: F401
