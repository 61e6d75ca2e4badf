# LSMDC multiple-choice finetune (reference
# configs/exp_local/finetune_lsmdc_mc.py: LR 1.2e-5, wd 0.01, 20 epochs,
# cosine w/ 2-epoch warmup at ratio 1e-4, grad clip 50).
_base_ = ["finetune_msrvtt_mc.py"]

total_epochs = 20
data_root = "data/lsmdc"

data = dict(
    train=dict(ann_file=data_root + "/mc_train.jsonl",
               data_prefix=data_root + "/videos"),
    test=dict(ann_file=data_root + "/mc_test.jsonl",
              data_prefix=data_root + "/videos"),
)

optimizer = dict(grad_clip=50.0)
schedule = dict(warmup_epochs=2, warmup_start_ratio=0.0001)
