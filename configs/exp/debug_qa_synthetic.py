# CPU-runnable open-ended video QA on synthetic data (VideoQADataset +
# answer_cls readout + QA OE head + qa accuracy eval), exercised via the
# same CLI path as the real QA experiments.
_base_ = ["../_base_/default_runtime.py"]

img_size = 32
log_interval = 1
total_epochs = 2

_qa_records = [
    dict(filename=f"synthetic_video_{i}.mp4",
         question=f"the {w} runs fast", answer_idx=i % 4)
    for i, w in enumerate(
        ["dog", "cat", "man", "woman", "child", "ball", "park", "street"] * 2)
]

tokenizer = dict(synthetic=True)

model = dict(
    type="CloverFinetune",
    task="video_qa",
    answer_cls=True,
    qa_head="oe",
    num_labels=4,
    dtype="float32",
    vts_embed_dim=16,
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
)

data = dict(
    train=dict(type="VideoQADataset", records=_qa_records,
               backend="synthetic",
               backend_kwargs=dict(height=72, width=96),
               num_frames=4, canonical_size=40, max_length=16, mode="oe"),
    val=dict(type="VideoQADataset", records=_qa_records[:8],
             backend="synthetic",
             backend_kwargs=dict(height=72, width=96),
             num_frames=4, canonical_size=40, max_length=16, mode="oe",
             test_mode=True),
    train_loader=dict(batch_size=8, num_workers=2),
    val_loader=dict(batch_size=4, num_workers=2),
)

optimizer = dict(lr=1e-3, weight_decay=0.01, betas=(0.9, 0.98), grad_clip=5.0)
schedule = dict(warmup_epochs=0, min_lr_ratio=0.0)
evaluation = dict(interval=1, save_best="acc")
