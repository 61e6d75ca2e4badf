# MSVD-QA open-ended VQA, 1000-answer vocabulary
# (reference configs/exp_local/finetune_msvdQA.py:56-61).
_base_ = ["finetune_msrvttQA.py"]

data_root = "data/msvd_qa"

model = dict(num_labels=1000)

data = dict(
    train=dict(ann_file=data_root + "/train.jsonl",
               data_prefix=data_root + "/videos"),
    val=dict(ann_file=data_root + "/test.jsonl",
             data_prefix=data_root + "/videos"),
)
