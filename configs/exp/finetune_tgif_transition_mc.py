# TGIF transition multiple-choice QA (reference tgif_transition_mc).
_base_ = ["finetune_tgif_action_mc.py"]

data_root = "data/tgif"

data = dict(
    train=dict(ann_file=data_root + "/transition_train.jsonl"),
    val=dict(ann_file=data_root + "/transition_test.jsonl"),
)
