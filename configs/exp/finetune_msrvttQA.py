# MSRVTT-QA open-ended VQA (reference configs/exp_local/finetune_msrvttQA.py:
# answer-classification over a 1500-answer vocabulary on the fused text CLS).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 40
data_root = "data/msrvtt_qa"

model = dict(
    type="CloverFinetune",
    task="video_qa",
    answer_cls=True,
    qa_head="oe",
    num_labels=1500,
)

data = dict(
    train=dict(
        type="VideoQADataset",
        ann_file=data_root + "/train.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=256,
        max_length=40,
        mode="oe",
    ),
    val=dict(
        type="VideoQADataset",
        ann_file=data_root + "/test.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=224,
        max_length=40,
        mode="oe",
        test_mode=True,
    ),
    train_loader=dict(batch_size=64, num_workers=16),
    val_loader=dict(batch_size=64, num_workers=16),
)

optimizer = dict(lr=2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=4, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="acc")
