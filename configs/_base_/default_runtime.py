# Default runtime settings (reference configs/_base_/default_runtime.py
# equivalent: logging cadence, checkpointing, image size).
log_interval = 20
img_size = 224
checkpoint = dict(interval=1, max_to_keep=3)
ema = dict(enabled=False)
evaluation = dict(interval=1)
