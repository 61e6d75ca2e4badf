# MSVD retrieval finetune: multi-caption per video, varied-recall eval
# (reference MsvdVideoDataset, configs/exp_local/finetune_msvd_ret.py shape).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 100
data_root = "data/msvd"

model = dict(
    type="CloverFinetune",
    task="retrieval",
    loss=dict(type="NormSoftmaxLoss", temperature=0.05, cos_sim=True),
)

data = dict(
    train=dict(
        type="VideoTextDataset",
        ann_file=data_root + "/train.jsonl",   # text: list of captions
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=12,
        canonical_size=256,
        max_length=30,
    ),
    val=dict(
        type="VideoTextDataset",
        ann_file=data_root + "/test.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=12,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=30,
        test_mode=True,
    ),
    train_loader=dict(batch_size=128, num_workers=16),
    val_loader=dict(batch_size=64, num_workers=16),
)

optimizer = dict(lr=1.2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=10, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="Recall@1")
