# CPU-runnable end-to-end retrieval finetune on synthetic data.
# Exercises the full stack (decode -> device preprocess -> model -> NCE ->
# AdamW -> eval -> best ckpt) in under two minutes; CI and smoke config.
_base_ = ["../_base_/default_runtime.py"]

img_size = 32
log_interval = 1
total_epochs = 2

model = dict(
    type="CloverFinetune",
    task="retrieval",
    dtype="float32",
    vts_embed_dim=16,
    text_agg_type="cls",
    swin=dict(
        patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
        depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
        drop_path_rate=0.0,
    ),
    text_bert=dict(
        vocab_size=60, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        hidden_dropout=0.0, attention_dropout=0.0,
    ),
    fusion=dict(num_hidden_layers=1, img_in_size=16, hidden_size=16,
                num_frames=2, spatial_tokens=16),
    loss=dict(type="NormSoftmaxLoss", temperature=0.05, cos_sim=True),
)

data = dict(
    train=dict(type="SyntheticRetrievalDataset", n_videos=16, num_frames=4,
               canonical_size=40, seed=0),
    val=dict(type="SyntheticRetrievalDataset", n_videos=8, num_frames=4,
             test_canonical_size=40, test_mode=True, seed=1),
    train_loader=dict(batch_size=8, num_workers=2),
    val_loader=dict(batch_size=4, num_workers=2),
)

optimizer = dict(lr=1e-3, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=0, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="Recall@all")
