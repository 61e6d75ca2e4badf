# LSMDC fill-in-the-blank: [MASK]-token readout through the fusion
# transformer + answer classification (reference FIB task with
# answer_mask=True, multimodal_transformer_finetune.py:99-101).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 20
data_root = "data/lsmdc"

model = dict(
    type="CloverFinetune",
    task="FIB",
    answer_mask=True,
    qa_head="oe",
    num_labels=1000,
)

data = dict(
    train=dict(
        type="VideoQADataset",
        ann_file=data_root + "/fib_train.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=256,
        max_length=40,
        mode="oe",
        use_answer_mask=True,
    ),
    val=dict(
        type="VideoQADataset",
        ann_file=data_root + "/fib_test.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=224,
        max_length=40,
        mode="oe",
        use_answer_mask=True,
        test_mode=True,
    ),
    train_loader=dict(batch_size=64, num_workers=16),
    val_loader=dict(batch_size=64, num_workers=16),
)

optimizer = dict(lr=2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=2, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="acc")
