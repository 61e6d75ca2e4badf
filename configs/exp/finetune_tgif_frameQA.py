# TGIF-FrameQA open-ended (reference finetune_tgif_frameqa config shape;
# answers from a fixed vocabulary, single-frame questions over GIFs).
_base_ = ["finetune_msrvttQA.py"]

data_root = "data/tgif"

model = dict(num_labels=1540)

data = dict(
    train=dict(ann_file=data_root + "/frameqa_train.jsonl",
               data_prefix=data_root + "/gifs"),
    val=dict(ann_file=data_root + "/frameqa_test.jsonl",
             data_prefix=data_root + "/gifs"),
)
