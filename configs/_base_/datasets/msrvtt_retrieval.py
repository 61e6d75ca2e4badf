# MSRVTT 1k-A retrieval (reference configs/_base_/datasets_local/
# msrvtt_retrieval.py: 12 train frames / 32 test frames, 224^2).
data_root = "data/msrvtt"

data = dict(
    train=dict(
        type="VideoTextDataset",
        ann_file=data_root + "/train_9k.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=12,
        canonical_size=256,
        max_length=30,
    ),
    val=dict(
        type="VideoTextDataset",
        ann_file=data_root + "/test_1ka.jsonl",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=12,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=30,
        test_mode=True,
    ),
    test=dict(
        type="VideoTextDataset",
        ann_file=data_root + "/test_1ka.jsonl",
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
