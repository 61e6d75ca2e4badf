# Production-shape retrieval eval for the real-weight conversion dress
# rehearsal (tools/dress_rehearsal.py): full Swin-B + bert-base towers at
# 224^2 / 8 frames on a small synthetic MSRVTT-shaped split. With real
# weights, only load_from (and the dataset) change — the model section IS
# the production shape (reference finetune_msrvtt_retrieval.py:25-99).
_base_ = ["../_base_/default_runtime.py"]

img_size = 224
total_epochs = 1

model = dict(
    type="CloverFinetune",
    task="retrieval",
    dtype="float32",                  # CPU rehearsal; bfloat16 on TPU
    vts_embed_dim=768,
    text_agg_type="cls",
    swin=dict(drop_path_rate=0.0),    # Swin-B defaults (SwinConfig)
    text_bert=dict(hidden_dropout=0.0, attention_dropout=0.0),
    fusion=dict(num_hidden_layers=3, img_in_size=1024, hidden_size=768,
                num_frames=4, spatial_tokens=49),
)

data = dict(
    train=dict(type="SyntheticRetrievalDataset", n_videos=8, num_frames=8,
               canonical_size=224, seed=0, max_length=30),
    val=dict(type="SyntheticRetrievalDataset", n_videos=8, num_frames=8,
             test_canonical_size=224, test_mode=True, seed=1, max_length=30),
    train_loader=dict(batch_size=4, num_workers=2),
    val_loader=dict(batch_size=4, num_workers=2),
)

optimizer = dict(lr=1.2e-5, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=15.0)
schedule = dict(warmup_epochs=0, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="Recall@all")
