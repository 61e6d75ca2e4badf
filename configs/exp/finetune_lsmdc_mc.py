# LSMDC multiple-choice finetune (reference
# configs/exp_local/finetune_lsmdc_mc.py). NOTE the reference's LSMDC-MC
# is a *QA-architecture* recipe, unlike MSRVTT-MC's retrieval towers:
# task='video_qa' with answer_cls=True + QA_MC_head + CrossEntropyLoss
# over the 5 caption candidates (no question — each candidate is the
# whole text). LR 1.2e-5, wd 0.01, 20 epochs, 2-epoch warmup at ratio
# 1e-4, grad clip 50.
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 20
data_root = "data/lsmdc"

load_from = None  # pretrained pytree checkpoint

model = dict(
    type="CloverFinetune",
    task="video_qa",
    answer_cls=True,
    qa_head="mc",
)

data = dict(
    train=dict(
        type="VideoQADataset",
        ann_file=data_root + "/mc_train.jsonl",  # options + answer_idx
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=256,
        max_length=30,
        mode="mc",
    ),
    val=dict(
        type="VideoQADataset",
        ann_file=data_root + "/mc_test.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=224,
        max_length=30,
        mode="mc",
        test_mode=True,
    ),
    train_loader=dict(batch_size=16, num_workers=16),
    val_loader=dict(batch_size=16, num_workers=16),
)

optimizer = dict(lr=1.2e-5, weight_decay=0.01, betas=(0.9, 0.98),
                 grad_clip=50.0)
schedule = dict(warmup_epochs=2, warmup_start_ratio=0.0001, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="acc")
