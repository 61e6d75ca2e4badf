# MSRVTT multiple-choice finetune (reference
# configs/exp_local/finetune_msrvtt_mc.py: retrieval towers +
# NormSoftmaxLoss on the MC train split — LR 1.2e-5, wd 0.01, 100 epochs,
# cosine w/ 10-epoch warmup, grad clip 5). Training pairs each video with
# its CORRECT option (see data/datasets.py:MCRetrievalDataset); eval
# scores all 5 candidates (multiple_choice_retrieval_acc).
_base_ = ["test_msrvtt_mc.py"]

total_epochs = 100
data_root = "data/msrvtt"

load_from = None  # pretrained pytree checkpoint

data = dict(
    train=dict(
        type="MCRetrievalDataset",
        test_mode=False,
        ann_file=data_root + "/mc_train.jsonl",  # options + answer_idx
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        canonical_size=224,
        max_length=30,
    ),
    val=dict(
        type="MCRetrievalDataset",
        ann_file=data_root + "/mc_test.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=12,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=30,
    ),
    train_loader=dict(batch_size=16, num_workers=16),
    val_loader=dict(batch_size=32, num_workers=16),
)

optimizer = dict(lr=1.2e-5, weight_decay=0.01, betas=(0.9, 0.98),
                 grad_clip=5.0)
schedule = dict(warmup_epochs=10, warmup_start_ratio=0.001, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="acc")
