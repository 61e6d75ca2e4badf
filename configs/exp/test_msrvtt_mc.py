# MSRVTT multiple-choice test (eval-only): retrieval model scores 5
# candidate captions per video (reference MSRVTT-MC via acc_for_msrvtt_mc).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 0
data_root = "data/msrvtt"

model = dict(
    type="CloverFinetune",
    task="retrieval",
    eval_mode="mc_retrieval",
    loss=dict(type="NormSoftmaxLoss", temperature=0.05, cos_sim=True),
)

data = dict(
    test=dict(
        type="MCRetrievalDataset",
        ann_file=data_root + "/mc_test.jsonl",   # options + answer_idx
        data_prefix=data_root + "/videos",
        backend="opencv",
        num_frames=12,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=30,
    ),
    test_loader=dict(batch_size=64, num_workers=16),
)
