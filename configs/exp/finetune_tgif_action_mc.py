# TGIF action multiple-choice QA: 5 candidates scored through the fusion
# transformer with the MC head (reference configs/_base_/datasets_local/
# tgif_action_mc.py + finetune leaf).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 20
data_root = "data/tgif"

model = dict(
    type="CloverFinetune",
    task="video_qa",
    answer_cls=True,
    qa_head="mc",
)

data = dict(
    train=dict(
        type="VideoQADataset",
        ann_file=data_root + "/action_train.jsonl",
        data_prefix=data_root + "/gifs",
        backend="opencv",
        num_frames=8,
        canonical_size=256,
        max_length=40,
        mode="mc",
    ),
    val=dict(
        type="VideoQADataset",
        ann_file=data_root + "/action_test.jsonl",
        data_prefix=data_root + "/gifs",
        backend="opencv",
        num_frames=8,
        canonical_size=224,
        max_length=40,
        mode="mc",
        test_mode=True,
    ),
    train_loader=dict(batch_size=32, num_workers=16),
    val_loader=dict(batch_size=32, num_workers=16),
)

optimizer = dict(lr=2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=2, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="acc")
