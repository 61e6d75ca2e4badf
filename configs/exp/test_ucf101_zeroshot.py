# UCF101 zero-shot action recognition (eval-only): pretrained retrieval
# towers score each clip against class-name text embeddings (reference
# UCF101VideoDataset -> recall_for_zeroshot_action_recognition,
# video_dataset.py:443-513; 1-indexed labels). Point --ckpt-dir at a
# pretrained/converted checkpoint; annotations via
# tools/build_annotations.py --ucf101.
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 0
data_root = "data/ucf101"

model = dict(
    type="CloverFinetune",
    task="retrieval",
    eval_mode="zeroshot_action",
    class_template="a video of {}",
    loss=dict(type="NormSoftmaxLoss", temperature=0.05, cos_sim=True),
)

data = dict(
    test=dict(
        type="ActionVideoDataset",
        ann_file=data_root + "/test_split1.jsonl",   # {filename, label}
        class_names_file=data_root + "/classInd.txt",
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=8,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=30,
    ),
    test_loader=dict(batch_size=32, num_workers=16),
)
