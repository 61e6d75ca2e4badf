# DiDeMo paragraph-to-video retrieval: 32-frame clips, concatenated
# sentence "paragraph" captions, longer text (reference temporal_cat flag,
# datasets/pipelines/loading.py:404-410; finetune_didemo_ret config shape).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 100
data_root = "data/didemo"

model = dict(
    type="CloverFinetune",
    task="retrieval",
    fusion=dict(num_frames=16),   # 32 frames -> 16 latent
    loss=dict(type="NormSoftmaxLoss", temperature=0.05, cos_sim=True),
)

data = dict(
    train=dict(
        type="VideoTextDataset",
        # annotations pre-concatenate each video's sentences into one
        # paragraph caption (temporal_cat equivalent)
        ann_file=data_root + "/train_paragraph.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=32,
        canonical_size=256,
        max_length=64,
    ),
    val=dict(
        type="VideoTextDataset",
        ann_file=data_root + "/test_paragraph.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=32,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=64,
        test_mode=True,
    ),
    train_loader=dict(batch_size=64, num_workers=16),
    val_loader=dict(batch_size=32, num_workers=16),
)

optimizer = dict(lr=1.2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=10, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="Recall@all")
