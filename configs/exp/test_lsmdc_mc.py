# LSMDC multiple-choice test (eval-only).
_base_ = ["test_msrvtt_mc.py"]

data_root = "data/lsmdc"

data = dict(
    test=dict(ann_file=data_root + "/mc_test.jsonl",
              data_prefix=data_root + "/videos"),
)
