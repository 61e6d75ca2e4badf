# CPU-runnable tri-modal pretraining on synthetic data with DUAL loaders
# (video + image-as-1-frame corpus), mirroring the flagship
# pretrain_webvid_cc3m run shape at toy scale.
_base_ = ["../_base_/default_runtime.py"]

img_size = 32
log_interval = 1
total_epochs = 1

model = dict(
    type="CloverPretrain",
    dtype="float32",
    vts_embed_dim=16,
    text_agg_type="cls",
    use_mlm=True,
    use_cmask=True,
    symmetry_rank=True,
    swin=dict(
        patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
        depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
        drop_path_rate=0.0, mask_token=True,
    ),
    text_bert=dict(
        vocab_size=60, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        hidden_dropout=0.0, attention_dropout=0.0,
    ),
    fusion=dict(num_hidden_layers=1, img_in_size=16, hidden_size=16,
                num_frames=2, spatial_tokens=16),
    ssl_loss=dict(temperature=0.05, use_rank=True, use_rank_ttm=True,
                  margin_ttm=5.0),
    mlm_loss=dict(gamma=2.0),
)

data = dict(
    train=[
        dict(type="SyntheticRetrievalDataset", n_videos=16, num_frames=4,
             canonical_size=40, mlm=True, video_mask=True,
             video_mask_grid=4, num_masking_patches=4, seed=0),
        # image corpus: single-frame clips (CC3M analogue, T=1 -> latent 1)
        dict(type="SyntheticRetrievalDataset", n_videos=8, num_frames=4,
             canonical_size=40, mlm=True, video_mask=True,
             video_mask_grid=4, num_masking_patches=4, seed=7),
    ],
    val=dict(type="SyntheticRetrievalDataset", n_videos=8, num_frames=4,
             test_canonical_size=40, test_mode=True, seed=1),
    train_loader=dict(batch_size=8, num_workers=2),
    val_loader=dict(batch_size=4, num_workers=2),
)

optimizer = dict(lr=1e-3, weight_decay=0.005, betas=(0.9, 0.98), grad_clip=15.0)
schedule = dict(warmup_epochs=0, min_lr_ratio=1e-3)
evaluation = dict(interval=1, save_best="Recall@all")
