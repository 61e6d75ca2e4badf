# Flagship pretraining: WebVid (video) + CC3M (image) dual-loader tri-modal
# alignment (reference configs/exp_local/pretrain_webvid_cc3m.py:
# global LR 5e-5, wd 0.005, 40 epochs, 4-epoch warmup, grad clip 15,
# content-word MLM masking + 10-patch blockwise video masking).
_base_ = [
    "../_base_/models/clover_base.py",
    "../_base_/default_runtime.py",
]

total_epochs = 40
webvid_root = "data/webvid"
cc3m_root = "data/cc3m"

model = dict(
    type="CloverPretrain",
    use_mlm=True,
    use_cmask=True,
    symmetry_rank=True,
    swin=dict(mask_token=True),
    ssl_loss=dict(temperature=0.05, use_rank=True, use_rank_ttm=True,
                  margin_ttm=5.0),
    mlm_loss=dict(gamma=2.0),
)

data = dict(
    train=[
        dict(
            type="VideoTextDataset",
            ann_file=webvid_root + "/train.jsonl",
            data_prefix=webvid_root + "/videos",
            backend="opencv",
            num_frames=8,
            canonical_size=256,
            max_length=30,
            mlm=True,
            mask_engine="pos_content_word",
            video_mask=True,
            video_mask_grid=7,
            num_masking_patches=10,
        ),
        dict(
            type="VideoTextDataset",
            ann_file=cc3m_root + "/train.jsonl",
            data_prefix=cc3m_root + "/images",
            backend="image",
            num_frames=2,          # single image duplicated to patch stride
            canonical_size=256,
            max_length=30,
            mlm=True,
            mask_engine="pos_content_word",
            video_mask=True,
            video_mask_grid=7,
            num_masking_patches=10,
        ),
    ],
    val=dict(
        type="VideoTextDataset",
        ann_file="data/msrvtt/test_1ka.jsonl",
        data_prefix="data/msrvtt/videos",
        backend="opencv",
        num_frames=8,
        test_num_frames=32,
        test_canonical_size=224,
        max_length=30,
        test_mode=True,
    ),
    train_loader=dict(batch_size=256, num_workers=32),
    val_loader=dict(batch_size=64, num_workers=16),
)

optimizer = dict(lr=5e-5, weight_decay=0.005, betas=(0.9, 0.98), grad_clip=15.0)
schedule = dict(warmup_epochs=4, warmup_start_ratio=0.001, min_lr_ratio=1e-3)
evaluation = dict(interval=1, save_best="Recall@all")
