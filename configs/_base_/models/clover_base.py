# Swin-B + BERT-base Clover tower stack (reference
# configs/_base_/models/swin3d/swin3d_base_stride.py + leaf model dicts).
num_frames = 8

model = dict(
    dtype="bfloat16",
    vts_embed_dim=768,
    text_agg_type="cls",
    swin=dict(
        variant="base",
        patch_size=(2, 4, 4),
        stride=(2, 4, 4),
        window_size=(8, 7, 7),
        drop_path_rate=0.1,
        patch_norm=True,
    ),
    text_bert=dict(num_hidden_layers=12),
    fusion=dict(
        num_hidden_layers=3,
        img_in_size=1024,
        hidden_size=768,
        num_frames=4,          # latent frames = num_frames / patch stride
        spatial_tokens=49,
        use_text_cls=True,
        word_pos_start=False,
    ),
)

tokenizer = dict(vocab_file="data/bert-base-uncased-vocab.txt")
