# MSRVTT retrieval finetune (reference
# configs/exp_local/finetune_msrvtt_retrieval.py: global LR 1.2e-5,
# wd 0.01, 100 epochs, cosine w/ 10-epoch warmup, grad clip 5).
_base_ = [
    "../_base_/datasets/msrvtt_retrieval.py",
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 100

model = dict(
    type="CloverFinetune",
    task="retrieval",
    loss=dict(type="NormSoftmaxLoss", temperature=0.05, cos_sim=True),
)

# pretrained pytree checkpoint to start from (converted or pretrained here)
load_from = None

optimizer = dict(lr=1.2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=10, warmup_start_ratio=0.001, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="Recall@all")
