#!/usr/bin/env python
"""Benchmark: MSRVTT-eval-shaped retrieval throughput on one TPU chip.

Measures the north-star workload (BASELINE.md): dual-tower embedding
extraction — fused on-device preprocessing from uint8 + Video Swin-B +
BERT-base + NCE projection heads — at 8x224x224 frames, bf16, steady
state. Prints ONE json line:

  {"metric": ..., "value": clips/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline divides by the locally measured eager-PyTorch CPU equivalent
(bench/baseline_measured.json, produced by bench/baseline_torch.py) — the
only PyTorch number measurable in this image; the reference repo publishes
none and its CUDA stack cannot run here (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# bf16 peak matmul throughput by device kind — for the mfu field only
# (public spec sheets; None -> mfu omitted)
_BF16_PEAK_TFLOPS = (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                     ("v4", 275.0), ("v6", 918.0), ("v3", 123.0))


def _flops_fields(jitted, args, dt_seconds, iters=1):
    """achieved TFLOP/s + MFU from the compiled executable's own cost
    analysis (exact for XLA ops; Pallas kernels report the true algebraic
    flops via their CostEstimate). AOT lower+compile hits the compile
    cache, so this is free after the timed run. XLA counts a while/scan
    body ONCE regardless of trip count, and both benchmarks are exactly
    one lax.scan over ``iters`` identical batches — so scale by iters
    (verified: the raw count equals one batch's algebraic flops).
    Returns {} if the backend doesn't expose cost analysis."""
    import jax

    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) * iters
    except Exception:
        return {}
    if flops <= 0:
        return {}
    achieved = flops / dt_seconds / 1e12
    fields = {"model_tflops_per_dispatch": round(flops / 1e12, 3),
              "achieved_tflops_per_sec": round(achieved, 2)}
    dev = str(jax.devices()[0]).lower()
    for key, peak in _BF16_PEAK_TFLOPS:
        if key in dev:
            fields["mfu_bf16_peak"] = round(achieved / peak, 4)
            break
    return fields


def _timed_runs(fn, n: int):
    """Run ``fn`` (returns wall seconds) n times; (best_dt, all_dts).

    BENCH_REPEAT>1 reports the per-run spread so the headline figure is
    reproducible rather than best-of-unknown-N (run variance on this relay
    measured ~1.6%% between driver and local runs)."""
    dts = [fn() for _ in range(max(1, n))]
    return min(dts), dts


def bench_finetune():
    """Retrieval-finetune training-step throughput at the reference's
    actual finetune shape: 12 frames, single Swin + BERT + NCE head
    (msrvtt_retrieval.py:16 — 12 train frames; finetune_msrvtt_retrieval.py:
    8-12 — 16 clips/GPU, NormSoftmaxLoss)."""
    import jax
    import jax.numpy as jnp

    from clover_tpu.engine import TrainState, make_optimizer
    from clover_tpu.engine.steps import make_retrieval_train_step
    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )

    B = int(os.environ.get("BENCH_BATCH", 16))
    T = int(os.environ.get("BENCH_FRAMES", 12))
    ITERS = int(os.environ.get("BENCH_ITERS", 8))
    ATTN = os.environ.get("BENCH_ATTN", "auto")
    S, L = 224, 30

    cfg = FinetuneConfig(
        swin=SwinConfig.base(
            attention_impl=ATTN,
            fused_mlp=os.environ.get("BENCH_MLP", "pallas") != "xla",
            window_resident=os.environ.get("BENCH_WIN_RESIDENT", "1") == "1",
            use_checkpoint={"1": True, "0": False}.get(
                os.environ.get("BENCH_REMAT", "0"),
                tuple(int(s) for s in os.environ.get(
                    "BENCH_REMAT", "0").split(",")))),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batches = {
        "imgs": jnp.asarray(rng.normal(size=(ITERS, B, T, S, S, 3))
                            .astype(np.float32) * 0.5),
        "token_ids": jnp.asarray(
            rng.integers(1000, 30000, size=(ITERS, B, L)), jnp.int32),
        "input_mask": jnp.ones((ITERS, B, L), jnp.int32),
    }
    first = {k: v[0] for k, v in batches.items()}
    params = jax.jit(lambda k, b: model.init(k, b, train=False)["params"])(
        jax.random.PRNGKey(0), first)
    jax.block_until_ready(params)
    tx, _ = make_optimizer(params, base_lr=1.2e-5, total_steps=1000,
                           warmup_steps=10)
    state = TrainState.create(params, tx)
    step = make_retrieval_train_step(model, jit=False, grad_clip_norm=15.0)

    # donate_argnums=0 matches the production step's donation
    # (engine/steps.py) — without it the bench holds a SECOND copy of the
    # ~3 GB params+opt state live across the call, understating the
    # feasible batch/remat frontier vs the real trainer.
    @partial(jax.jit, donate_argnums=0)
    def run_all(state, batches, key):
        def body(state, batch):
            state, metrics = step(state, batch, key)
            return state, metrics["loss"]

        return jax.lax.scan(body, state, batches)

    key = jax.random.key(
        1, impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg"))  # hw-RNG dropout
    state, losses = run_all(state, batches, key)  # compile + warm
    np.asarray(losses)

    def timed():
        nonlocal state  # donated: chain the carried state across runs
        t0 = time.time()
        state, losses = run_all(state, batches, key)
        np.asarray(losses)
        return time.time() - t0

    dt, dts = _timed_runs(timed, int(os.environ.get("BENCH_REPEAT", 1)))
    print(json.dumps({
        "metric": "msrvtt_finetune_train_clips_per_sec_per_chip",
        "value": round(B * ITERS / dt, 3),
        "unit": "clips/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "iters": ITERS,
        "seconds": round(dt, 3),
        "runs": [round(B * ITERS / d, 1) for d in dts] if len(dts) > 1 else None,
        "attention_impl": ATTN,
        "device": str(jax.devices()[0]),
        **_flops_fields(run_all, (state, batches, key), dt, iters=ITERS),
    }))


def bench_itm():
    """Fusion-tower eval throughput: ITM rerank scoring (pairs/sec).

    The itm retrieval eval's hot loop — cached Swin tokens + text through
    the 3-layer cross-modal tower + ITM head (reference non-separate
    forward_test, multimodal_transformer_pretrain.py:220-225; the cached-
    token protocol is eval_loop.run_itm_retrieval_eval)."""
    import jax
    import jax.numpy as jnp

    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )

    B = int(os.environ.get("BENCH_BATCH", 128))
    T = int(os.environ.get("BENCH_FRAMES", 8))
    ITERS = int(os.environ.get("BENCH_ITERS", 32))
    L = 30

    cfg = FinetuneConfig(
        swin=SwinConfig.base(),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
        use_itm_head=True,
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    tokens_all = jnp.asarray(rng.normal(
        size=(ITERS, B, T // 2, 49, 1024)).astype(np.float32),
        jnp.bfloat16)
    token_all = jnp.asarray(
        rng.integers(1000, 30000, size=(ITERS, B, L)), jnp.int32)
    input_mask = jnp.ones((B, L), jnp.int32)

    params = jax.jit(
        lambda k, vt, tok: model.init(k, vt, tok, input_mask,
                                      method="itm_pair_score")
    )(jax.random.PRNGKey(0), tokens_all[0], token_all[0])
    jax.block_until_ready(params)

    @jax.jit
    def run_all(params, tokens_all, token_all):
        def body(carry, inp):
            vt, tok = inp
            score = model.apply(params, vt, tok, input_mask,
                                method="itm_pair_score")
            return carry + score.sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), (tokens_all, token_all))
        return total

    out = float(run_all(params, tokens_all, token_all))  # compile + warm

    def timed():
        t0 = time.time()
        float(run_all(params, tokens_all, token_all))
        return time.time() - t0

    dt, dts = _timed_runs(timed, int(os.environ.get("BENCH_REPEAT", 1)))
    assert np.isfinite(out)
    print(json.dumps({
        "metric": "itm_rerank_pairs_per_sec_per_chip",
        "value": round(B * ITERS / dt, 3),
        "unit": "pairs/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "iters": ITERS,
        "seconds": round(dt, 3),
        "runs": [round(B * ITERS / d, 1) for d in dts] if len(dts) > 1 else None,
        "device": str(jax.devices()[0]),
        **_flops_fields(run_all, (params, tokens_all, token_all), dt,
                        iters=ITERS),
    }))


def bench_serving():
    """BENCH_MODE=serving: exported StableHLO video-tower artifact executed
    on the real chip vs the in-framework jit path — the AOT bundle's
    parity + throughput evidence (docs/SCALING.md serving story). Per-call
    dispatch on both sides (the serving shape), async until one final
    sync, so the ~34 ms relay dispatch overhead hits both equally."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from clover_tpu import serving
    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )
    from clover_tpu.models.swin3d import swin_bias_cache
    from clover_tpu.ops.preprocess import eval_preprocess

    B = int(os.environ.get("BENCH_BATCH", 32))
    T = int(os.environ.get("BENCH_FRAMES", 8))
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    S, L = 224, 30

    cfg = FinetuneConfig(
        swin=SwinConfig.base(embed_impl="s2d", fold_normalize=True),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames_all = [jnp.asarray(rng.integers(
        0, 256, size=(B, T, S, S, 3), dtype=np.uint8)) for _ in range(ITERS)]

    init_imgs = eval_preprocess(frames_all[0], out_size=S,
                                dtype=jnp.bfloat16, normalize=False)
    token0 = jnp.asarray(rng.integers(1000, 30000, size=(B, L)), jnp.int32)
    mask0 = jnp.ones((B, L), jnp.int32)
    # init through forward_test so BOTH towers' params exist (the bundle
    # exports video + text + similarity)
    params = jax.jit(
        lambda k, f, tok, m: model.init(k, f[:, None], tok, m,
                                        method="forward_test"))(
        jax.random.PRNGKey(0), init_imgs, token0, mask0)
    jax.block_until_ready(params)

    # weights-separate export: the weight-BAKED module exceeds this
    # relay's remote-compile request limit (HTTP 413 — weights travel as
    # HLO constants); the split artifact is the standard large-model
    # serving mode and measures the same compute graph
    exports = serving.export_retrieval_towers(
        model, params, batch_sizes=(B,), frames=T, image_size=S,
        text_len=L, sim_candidates=128, bake_params=False)
    bundle = os.path.join(tempfile.mkdtemp(prefix="clover_bundle_"), "b")
    serving.save_bundle(exports, bundle)
    fns = serving.load_bundle(bundle)
    bias_cache = jax.jit(lambda p: swin_bias_cache(
        p["params"]["backbone"], cfg.swin, (T, S, S)))(params)
    vid_raw = fns[f"video_tower_b{B}"]
    vid = lambda f: vid_raw(params, bias_cache, f)

    @jax.jit
    def jit_video(params, frames_u8, bias_cache):
        imgs = eval_preprocess(frames_u8, out_size=S, dtype=jnp.bfloat16,
                               normalize=False)
        return model.apply(params, imgs[:, None], bias_cache,
                           method="forward_video").astype(jnp.float32)

    def run(fn):
        outs = [fn(f) for f in frames_all]
        total = float(sum(np.asarray(o).sum() for o in outs))
        return total

    emb_a = np.asarray(vid(frames_all[0]))
    emb_j = np.asarray(jit_video(params, frames_all[0], bias_cache))
    parity = float(np.max(np.abs(emb_a - emb_j)))

    run(vid)                                       # warm
    t0 = time.time()
    total = run(vid)
    artifact_dt = time.time() - t0
    run(lambda f: jit_video(params, f, bias_cache))  # warm
    t0 = time.time()
    run(lambda f: jit_video(params, f, bias_cache))
    jit_dt = time.time() - t0
    assert np.isfinite(total)

    print(json.dumps({
        "metric": "serving_artifact_video_tower_clips_per_sec_per_chip",
        "value": round(B * ITERS / artifact_dt, 3),
        "unit": "clips/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "iters": ITERS,
        "seconds": round(artifact_dt, 3),
        "jit_clips_per_sec": round(B * ITERS / jit_dt, 3),
        "artifact_vs_jit": round(jit_dt / artifact_dt, 4),
        "artifact_jit_max_abs_diff": parity,
        "bundle_bytes": sum(
            os.path.getsize(os.path.join(bundle, f))
            for f in os.listdir(bundle)),
        "device": str(jax.devices()[0]),
    }))


def bench_train():
    """Pretrain training-step throughput (clips/sec, fwd+bwd+AdamW)."""
    import jax
    import jax.numpy as jnp

    from clover_tpu.engine import TrainState, make_optimizer
    from clover_tpu.engine.steps import make_pretrain_train_step
    from clover_tpu.models import (
        BertConfig,
        CloverPretrain,
        FusionConfig,
        PretrainConfig,
        SwinConfig,
    )

    B = int(os.environ.get("BENCH_BATCH", 8))
    T = int(os.environ.get("BENCH_FRAMES", 8))
    ITERS = int(os.environ.get("BENCH_ITERS", 8))
    ATTN = os.environ.get("BENCH_ATTN", "auto")
    S, L = 224, 30
    if os.environ.get("BENCH_REMAT", "0") != "0":
        # remat recipes: the fwd re-runs in the backward, so the MLP z-stash
        # is pure extra traffic AND the extra residency HBM-OOMs the 32f
        # B=8 remat-0,1 recipe (16.15G/15.75G measured r5). Read at trace
        # time by ops/mlp_block.py; explicit env still wins.
        os.environ.setdefault("CLOVER_MLP_STASH", "0")

    # remat sweep history: with the fused attention bwd kernel — full 40.4 /
    # selective stages 0-1 43.9-48.2 / none 45.3; after the grouped bwd
    # kernel (stage 3 fused instead of XLA fallback) recompute became a net
    # loss: none 52.6 (B=8) / 53.3 (B=16, fits HBM) vs selective 49.4.
    # No-remat is the default recipe; set BENCH_REMAT=0,1 / 1 for the
    # memory-constrained variants.
    cfg = PretrainConfig(
        swin=SwinConfig.base(mask_token=True, attention_impl=ATTN,
                             window_resident=os.environ.get(
                                 "BENCH_WIN_RESIDENT", "1") == "1",
                             fused_mlp=os.environ.get("BENCH_MLP", "pallas") != "xla",
                             use_checkpoint={"1": True, "0": False}.get(
                                 os.environ.get("BENCH_REMAT", "0"),
                                 tuple(int(s) for s in os.environ.get(
                                     "BENCH_REMAT", "0").split(",")))),
        share_embed=os.environ.get("BENCH_SHARE_EMBED", "1") == "1",
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
    )
    model = CloverPretrain(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    token_ids = rng.integers(1000, 30000, size=(ITERS, B, L)).astype(np.int32)
    mlm_label = np.full((ITERS, B, L), -100, np.int32)
    mlm_label[:, :, 3] = token_ids[:, :, 3]
    token_ids[:, :, 3] = 103
    batches = {
        "imgs": jnp.asarray(rng.normal(size=(ITERS, B, T, S, S, 3))
                            .astype(np.float32) * 0.5),
        "token_ids": jnp.asarray(token_ids),
        "input_mask": jnp.ones((ITERS, B, L), jnp.int32),
        "mlm_label": jnp.asarray(mlm_label),
        "v_token_mask": jnp.asarray(
            rng.integers(0, 2, (ITERS, B, 7, 7)).astype(np.int32)),
    }
    first = {k: v[0] for k, v in batches.items()}
    params = jax.jit(lambda k, b: model.init(k, b, train=False)["params"])(
        jax.random.PRNGKey(0), first)
    jax.block_until_ready(params)
    tx, _ = make_optimizer(params, base_lr=5e-5, total_steps=1000,
                           warmup_steps=10)
    state = TrainState.create(params, tx)
    # BENCH_GRAD_CLIP=0 disables the global-norm clip (A/B: at 32f the
    # sumsq epilogues detach from the remat dW fusions into ~400 scalar
    # dispatches/step — r5 probe)
    clip = float(os.environ.get("BENCH_GRAD_CLIP", "15.0")) or None
    step = make_pretrain_train_step(model, jit=False, grad_clip_norm=clip)

    # donate_argnums=0: see the finetune mode's note — matches the
    # production step's donation (engine/steps.py), frees ~3 GB of
    # duplicated params+opt state, and moves the OOM frontier to where
    # the real trainer's sits.
    @partial(jax.jit, donate_argnums=0)
    def run_all(state, batches, key):
        def body(state, batch):
            state, metrics = step(state, batch, key)
            return state, metrics["loss"]

        return jax.lax.scan(body, state, batches)

    key = jax.random.key(
        1, impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg"))  # hw-RNG dropout
    dump = os.environ.get("BENCH_DUMP_HLO")
    if dump:
        # optimized HLO of the EXACT traced program — instruction names
        # match the profiler trace events (trace_groups.py --hlo regions)
        with open(dump, "w") as f:
            f.write(run_all.lower(state, batches, key).compile().as_text())
    state, losses = run_all(state, batches, key)  # compile + warm
    # host transfer forces completion (block_until_ready is unreliable
    # through the axon relay — measured as a no-op)
    np.asarray(losses)
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:  # steady-state-only trace (tools/profile_bench.py)
        jax.profiler.start_trace(trace_dir)

    def timed():
        nonlocal state  # donated: chain the carried state across runs
        t0 = time.time()
        # rebind state BEFORE the finiteness assert: with donate_argnums the
        # old state buffers are consumed by the call, so raising between the
        # call and the rebind would leave `state` pointing at deleted buffers
        # (benign while the assert aborts the script, but kept safe in case
        # error handling is ever added around timed())
        state, losses = run_all(state, batches, key)
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses))
        return time.time() - t0

    dt, dts = _timed_runs(timed, int(os.environ.get("BENCH_REPEAT", 1)))
    if trace_dir:
        jax.profiler.stop_trace()
    print(json.dumps({
        "metric": "pretrain_train_clips_per_sec_per_chip",
        "value": round(B * ITERS / dt, 3),
        "unit": "clips/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "iters": ITERS,
        "seconds": round(dt, 3),
        "runs": [round(B * ITERS / d, 1) for d in dts] if len(dts) > 1 else None,
        "attention_impl": ATTN,
        "device": str(jax.devices()[0]),
        **_flops_fields(run_all, (state, batches, key), dt, iters=ITERS),
    }))


class _BenchEvalDataset:
    """Self-contained eval-shaped dataset for the loader-in-loop bench:
    decode (synthetic or rawframes) -> canonical resize -> center crop ->
    uint8 frames + procedural tokens. Mirrors the real eval pipeline's
    per-sample host work (datasets.py VideoTextDataset test pipeline)."""

    def __init__(self, n: int, T: int, S: int, L: int,
                 backend_name: str = "synthetic", root: str = ""):
        from clover_tpu.data.decode import get_backend

        self.n, self.T, self.S, self.L = n, T, S, L
        self.backend_name = backend_name
        if backend_name == "rawframes":
            self.backend = get_backend("rawframes", start_index=0,
                                       target_short_side=S)
            self.paths = [os.path.join(root, f"vid_{i:05d}") for i in range(n)]
        elif backend_name == "packed":
            # decode-free clip cache: eval-ready S x S frames, fetch is a
            # memcpy (data/clip_cache.py). Pack built once by write_pack.
            self.backend = get_backend("packed", path=root)
            self.paths = [f"bench_video_{i}.mp4" for i in range(n)]
        else:
            self.backend = get_backend("synthetic", height=240, width=320,
                                       length=64)
            self.paths = [f"bench_video_{i}.mp4" for i in range(n)]

    @staticmethod
    def write_pack(stem: str, n: int, T: int, S: int, s2d_patch=None):
        """Materialize the packed clip cache (once): synthetic decode +
        eval resize (+ optionally the host_s2d patch transpose) paid at
        build time, exactly what tools/build_clip_cache.py does for real
        corpora."""
        from clover_tpu.data.clip_cache import ClipCache, build_clip_cache
        from clover_tpu.data.decode import SyntheticVideoBackend

        want_layout = "s2d" if s2d_patch else "thwc"
        if os.path.exists(stem + ".json") and os.path.exists(stem + ".bin"):
            cache = ClipCache(stem)
            if (len(cache) >= n and cache.frames == T and cache.height == S
                    and cache.layout == want_layout):
                return
        build_clip_cache(stem, [f"bench_video_{i}.mp4" for i in range(n)],
                         SyntheticVideoBackend(height=240, width=320,
                                               length=64),
                         num_frames=T, size=S, s2d_patch=s2d_patch)

    @staticmethod
    def write_rawframes(root: str, n: int, T: int):
        """Materialize JPEG frame dirs (once) for the rawframes backend."""
        import cv2

        from clover_tpu.data.decode import SyntheticVideoBackend

        gen = SyntheticVideoBackend(height=240, width=320, length=T)
        for i in range(n):
            d = os.path.join(root, f"vid_{i:05d}")
            if os.path.isdir(d) and len(os.listdir(d)) >= T:
                continue
            os.makedirs(d, exist_ok=True)
            frames = gen.decode(f"bench_video_{i}.mp4", list(range(T)))
            for t in range(T):
                cv2.imwrite(os.path.join(d, f"img_{t:05d}.jpg"),
                            cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        import cv2

        if getattr(self.backend, "layout", "thwc") == "s2d":
            # pre-s2d pack: the record IS the eval-ready clip in patch-
            # embed layout; the collate detects shape[-1] != 3 and skips
            # its s2d transform — per-clip host cost is one memcpy (paid
            # by the collate's stack; decode returns an mmap view)
            rng = np.random.default_rng(i)
            return {
                "imgs": self.backend.decode(self.paths[i],
                                            list(range(self.T))),
                "token_ids": rng.integers(1000, 30000, self.L).astype(np.int32),
                "input_mask": np.ones(self.L, np.int32),
            }
        frames = self.backend.decode(self.paths[i], list(range(self.T)))
        if frames.shape[1] != self.S or frames.shape[2] != self.S:
            # canonical short-side resize + center crop (eval contract);
            # packed clips come back already S x S — pure memcpy path
            h, w = frames.shape[1:3]
            scale = self.S / min(h, w)
            nh, nw = round(h * scale), round(w * scale)
            frames = np.stack([cv2.resize(f, (nw, nh)) for f in frames])
            y0, x0 = (nh - self.S) // 2, (nw - self.S) // 2
            frames = frames[:, y0:y0 + self.S, x0:x0 + self.S]
        rng = np.random.default_rng(i)
        return {
            "imgs": frames,
            "token_ids": rng.integers(1000, 30000, self.L).astype(np.int32),
            "input_mask": np.ones(self.L, np.int32),
        }


def bench_loader_eval():
    """BENCH_INPUT=loader: eval throughput with the REAL input pipeline in
    the measurement loop — DataLoader workers + host_s2d collate +
    prefetch_to_device + per-batch jit dispatch (the tools/test.py shape),
    vs the same dispatch pattern fed from pre-staged device batches.

    Reports combined clips/s plus the loader-only and device-only rates so
    the host-bound gap is explicit (the scan benches assume a saturating
    feed; the reference's iter time always included data,
    clover_runner.py:17-34). NOTE this image has 1 host core and reaches
    the TPU through a relay, so the loader rate here is a floor — see
    BASELINE.md host-pipeline scaling notes."""
    import tempfile
    import jax
    import jax.numpy as jnp

    from clover_tpu.data.loader import DataLoader, prefetch_to_device
    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )
    from clover_tpu.models.swin3d import swin_bias_cache

    B = int(os.environ.get("BENCH_BATCH", 32))
    T = int(os.environ.get("BENCH_FRAMES", 8))
    N_BATCHES = int(os.environ.get("BENCH_ITERS", 16))
    WORKERS = int(os.environ.get("BENCH_WORKERS", 4))
    BACKEND = os.environ.get("BENCH_LOADER_BACKEND", "synthetic")
    S, L = 224, 30

    root = ""
    if BACKEND == "rawframes":
        root = os.environ.get("BENCH_LOADER_ROOT",
                              os.path.join(tempfile.gettempdir(),
                                           f"bench_rawframes_T{T}"))
        _BenchEvalDataset.write_rawframes(root, N_BATCHES * B, T)
    elif BACKEND == "packed":
        # BENCH_PACK_LAYOUT: 's2d' (default — production recommendation:
        # resize AND patch-embed transpose paid at build time) or 'thwc'
        layout = os.environ.get("BENCH_PACK_LAYOUT", "s2d")
        root = os.environ.get("BENCH_LOADER_ROOT",
                              os.path.join(tempfile.gettempdir(),
                                           f"bench_pack_T{T}_S224_{layout}"))
        _BenchEvalDataset.write_pack(
            root, N_BATCHES * B, T, S,
            s2d_patch=(2, 4, 4) if layout == "s2d" else None)
    ds = _BenchEvalDataset(N_BATCHES * B, T, S, L, BACKEND, root)

    cfg = FinetuneConfig(
        swin=SwinConfig.base(embed_impl="host_s2d", fold_normalize=True),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)

    # reuse_buffers: dodge the per-batch anonymous-page first-touch cost
    # (0.05 GB/s on this VM vs ~3 GB/s reuse — loader._BufferPool)
    REUSE = int(os.environ.get("BENCH_REUSE_BUFFERS", 6))
    loader = DataLoader(ds, batch_size=B, shuffle=False, drop_last=True,
                        num_workers=WORKERS, host_s2d=cfg.swin.patch_size,
                        reuse_buffers=REUSE)

    @jax.jit
    def step(params, imgs, token_ids, input_mask, bias_cache):
        v, t = model.apply(params, imgs[:, None], token_ids, input_mask,
                           bias_cache, method="forward_test")
        return v.astype(jnp.float32).sum() + t.astype(jnp.float32).sum()

    first = next(iter(loader.epoch(0)))
    params = jax.jit(
        lambda k, imgs, tok, m: model.init(k, imgs[:, None], tok, m,
                                           method="forward_test")
    )(jax.random.PRNGKey(0), jnp.asarray(first["imgs"]),
      jnp.asarray(first["token_ids"]), jnp.asarray(first["input_mask"]))
    jax.block_until_ready(params)
    bias_cache = jax.jit(lambda p: swin_bias_cache(
        p["params"]["backbone"], cfg.swin, (T, S, S)))(params)
    # warm the step compile
    np.asarray(step(params, jnp.asarray(first["imgs"]),
                    jnp.asarray(first["token_ids"]),
                    jnp.asarray(first["input_mask"]), bias_cache))

    # (0) host->device bandwidth: on this image the chip sits behind a
    # network relay (~33 MB/s measured 2026-08-20) — it, not the loader,
    # bounds the combined rate once the pack removes decode. A real TPU
    # host feeds over PCIe (GB/s); report the wall so the combined number
    # can be read correctly.
    probe = np.ascontiguousarray(first["imgs"])
    jax.device_put(probe).block_until_ready()
    t0 = time.time()
    np.asarray(jnp.max(jax.device_put(probe)))
    h2d_mbps = probe.nbytes / (time.time() - t0) / 2 ** 20
    bytes_per_clip = probe.nbytes / probe.shape[0]

    # (1) loader-only rate: full host pipeline, nothing dispatched
    t0 = time.time()
    n_seen = 0
    for b in loader.epoch(0):
        n_seen += b["imgs"].shape[0]
    loader_dt = time.time() - t0

    # (2) combined: loader -> device prefetch -> per-batch dispatch; one
    # host sync at the end (outputs are device scalars until then)
    t0 = time.time()
    outs = []
    for b in prefetch_to_device(loader.epoch(0), size=2):
        outs.append(step(params, b["imgs"], b["token_ids"],
                         b["input_mask"], bias_cache))
    total = float(sum(np.asarray(o) for o in outs))
    combined_dt = time.time() - t0
    assert np.isfinite(total)

    # (3) device-only: identical dispatch pattern from pre-staged batches
    staged = [jax.tree_util.tree_map(jnp.asarray, b)
              for b in loader.epoch(0)]
    outs = [step(params, b["imgs"], b["token_ids"], b["input_mask"],
                 bias_cache) for b in staged]  # warm queue once
    float(sum(np.asarray(o) for o in outs))
    t0 = time.time()
    outs = [step(params, b["imgs"], b["token_ids"], b["input_mask"],
                 bias_cache) for b in staged]
    float(sum(np.asarray(o) for o in outs))
    device_dt = time.time() - t0

    clips = n_seen
    combined = clips / combined_dt
    print(json.dumps({
        "metric": "msrvtt_eval_loader_in_loop_clips_per_sec_per_chip",
        "value": round(combined, 3),
        "unit": "clips/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "batches": N_BATCHES,
        "workers": WORKERS,
        "loader_backend": BACKEND,
        "seconds": round(combined_dt, 3),
        "loader_only_clips_per_sec": round(clips / loader_dt, 3),
        "device_only_clips_per_sec": round(clips / device_dt, 3),
        # fraction of the combined wall the device sat idle waiting on host
        "device_idle_frac": round(max(0.0, 1.0 - device_dt / combined_dt), 4),
        "h2d_MBps": round(h2d_mbps, 1),
        # what the transfer link alone allows (combined can't beat this)
        "h2d_bound_clips_per_sec": round(h2d_mbps * 2 ** 20 / bytes_per_clip,
                                         1),
        "device": str(jax.devices()[0]),
    }))


def bench_loader_train():
    """BENCH_MODE=train BENCH_INPUT=loader: pretrain train-step throughput
    with the REAL input pipeline in the measurement loop — VideoTextDataset
    (train mode: frame sampling, random crop/flip params, MLM content-word
    masking, BEiT video masking) -> DataLoader workers -> device
    preprocess_clips (crop/flip/normalize) -> per-batch jitted pretrain
    step. The reference's train iter time always included data
    (clover_runner.py:17-34); the scan-based BENCH_MODE=train number
    assumes a saturating feed — this mode measures the feed.

    BENCH_LOADER_BACKEND=synthetic (per-clip decode) or packed (thwc clip
    pack holding 2T frames at canonical size — TSN sampling keeps its
    temporal jitter, device RandomResizedCrop keeps its freedom).
    Reports loader-only / combined / device-only rates plus the
    host->device link wall (see bench_loader_eval)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from clover_tpu.data.datasets import VideoTextDataset
    from clover_tpu.data.loader import DataLoader, prefetch_to_device
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab
    from clover_tpu.engine import TrainState, make_optimizer
    from clover_tpu.engine.steps import make_pretrain_train_step
    from clover_tpu.models import (
        BertConfig,
        CloverPretrain,
        FusionConfig,
        PretrainConfig,
        SwinConfig,
    )
    from clover_tpu.ops.preprocess import preprocess_clips

    B = int(os.environ.get("BENCH_BATCH", 16))
    T = int(os.environ.get("BENCH_FRAMES", 8))
    N_BATCHES = int(os.environ.get("BENCH_ITERS", 8))
    WORKERS = int(os.environ.get("BENCH_WORKERS", 4))
    BACKEND = os.environ.get("BENCH_LOADER_BACKEND", "synthetic")
    CANON, OUT, L = 256, 224, 30
    n = N_BATCHES * B

    words = ("person dog cat car street park water table chair light "
             "runs walks jumps holds opens closes looks plays sits stands "
             "red blue green small large old young quick slow happy").split()
    cap_rng = np.random.default_rng(0)
    records = []
    for i in range(n):
        cap = " ".join(cap_rng.choice(words, size=int(cap_rng.integers(6, 12))))
        records.append({"filename": f"bench_video_{i}.mp4", "text": cap})
    tok = BertTokenizer(build_test_vocab(words))

    backend, backend_kwargs = "synthetic", {"height": 240, "width": 320,
                                            "length": 64}
    if BACKEND == "packed":
        from clover_tpu.data.clip_cache import ClipCache, build_clip_cache
        from clover_tpu.data.decode import SyntheticVideoBackend

        stem = os.environ.get(
            "BENCH_LOADER_ROOT",
            os.path.join(tempfile.gettempdir(),
                         f"bench_trainpack_T{2 * T}_S{CANON}"))
        need = True
        if os.path.exists(stem + ".json") and os.path.exists(stem + ".bin"):
            c = ClipCache(stem)
            need = not (len(c) >= n and c.frames == 2 * T
                        and c.height == CANON and c.layout == "thwc")
        if need:
            build_clip_cache(stem, [r["filename"] for r in records],
                             SyntheticVideoBackend(**backend_kwargs),
                             num_frames=2 * T, size=CANON)
        backend, backend_kwargs = "packed", {"path": stem}

    ds = VideoTextDataset(records=records, tokenizer=tok, num_frames=T,
                          canonical_size=CANON, max_length=L,
                          backend=backend, backend_kwargs=backend_kwargs,
                          mlm=True, video_mask=True)
    REUSE = int(os.environ.get("BENCH_REUSE_BUFFERS", 6))
    loader = DataLoader(ds, batch_size=B, shuffle=False, drop_last=True,
                        num_workers=WORKERS, reuse_buffers=REUSE)

    cfg = PretrainConfig(
        swin=SwinConfig.base(mask_token=True),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
    )
    model = CloverPretrain(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def to_model(imgs_u8, boxes, flip):
        # the train.py to_model_batch contract: device-side fused crop +
        # flip + normalize on the uint8 canonical frames
        x = preprocess_clips(imgs_u8.reshape((-1,) + imgs_u8.shape[2:]),
                             boxes, flip, out_size=OUT, dtype=jnp.bfloat16)
        return x.reshape(imgs_u8.shape[:2] + x.shape[1:])

    def model_batch(b):
        return {
            "imgs": to_model(b["imgs"], b["crop_boxes"], b["flip"]),
            "token_ids": b["token_ids"],
            "input_mask": b["input_mask"],
            "mlm_label": b["mlm_label"],
            "v_token_mask": b["v_token_mask"],
        }

    first_host = next(iter(loader.epoch(0)))
    first = model_batch(jax.tree_util.tree_map(jnp.asarray, first_host))
    params = jax.jit(lambda k, b: model.init(k, b, train=False)["params"])(
        jax.random.PRNGKey(0), first)
    jax.block_until_ready(params)
    tx, _ = make_optimizer(params, base_lr=5e-5, total_steps=1000,
                           warmup_steps=10)
    state = TrainState.create(params, tx)
    del params    # state owns the buffers; the donated chain below frees
    # ONE donated state chained through every phase — holding a second
    # state (3+ GB params+opt) alongside B=16 no-remat activations OOMs
    step = jax.jit(make_pretrain_train_step(model, jit=False,
                                            grad_clip_norm=15.0),
                   donate_argnums=0)
    key = jax.random.key(1, impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg"))
    state, metrics = step(state, first, key)        # warm the compile
    np.asarray(metrics["loss"])
    del first

    # (0) host->device link probe (see bench_loader_eval)
    probe = np.ascontiguousarray(first_host["imgs"])
    jax.device_put(probe).block_until_ready()
    t0 = time.time()
    np.asarray(jnp.max(jax.device_put(probe)))
    h2d_mbps = probe.nbytes / (time.time() - t0) / 2 ** 20
    bytes_per_clip = probe.nbytes / probe.shape[0]

    # (1) loader-only: full host pipeline, nothing dispatched
    t0 = time.time()
    n_seen = 0
    for b in loader.epoch(0):
        n_seen += b["imgs"].shape[0]
    loader_dt = time.time() - t0

    # (2) combined: loader -> device prefetch -> preprocess + train step
    losses = []
    t0 = time.time()
    for b in prefetch_to_device(loader.epoch(0), size=2):
        state, metrics = step(state, model_batch(b), key)
        losses.append(metrics["loss"])
    losses = np.asarray([np.asarray(x) for x in losses])
    combined_dt = time.time() - t0
    assert np.all(np.isfinite(losses))

    # (3) device-only: same per-batch dispatch from pre-staged host batches
    staged = [jax.tree_util.tree_map(jnp.asarray, b) for b in loader.epoch(0)]
    t0 = time.time()
    for b in staged:
        state, metrics = step(state, model_batch(b), key)
    np.asarray(metrics["loss"])
    device_dt = time.time() - t0

    print(json.dumps({
        "metric": "pretrain_train_loader_in_loop_clips_per_sec_per_chip",
        "value": round(n_seen / combined_dt, 3),
        "unit": "clips/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "batches": N_BATCHES,
        "workers": WORKERS,
        "loader_backend": BACKEND,
        "seconds": round(combined_dt, 3),
        "loader_only_clips_per_sec": round(n_seen / loader_dt, 3),
        "device_only_clips_per_sec": round(n_seen / device_dt, 3),
        "device_idle_frac": round(max(0.0, 1.0 - device_dt / combined_dt), 4),
        "h2d_MBps": round(h2d_mbps, 1),
        "h2d_bound_clips_per_sec": round(h2d_mbps * 2 ** 20 / bytes_per_clip,
                                         1),
        "device": str(jax.devices()[0]),
    }))


def bench_loader_finetune():
    """BENCH_MODE=finetune BENCH_INPUT=loader: retrieval-finetune train
    step with the REAL input pipeline in the loop (VERDICT r4 item 9 —
    finetune is the reference's most-used mode, 8 of 12 configs, and the
    packed cache was proven on eval + pretrain shapes only).

    BENCH_LOADER_BACKEND=packed (default here) reads thwc train packs
    holding 2T canonical frames per clip — TSN sampling keeps its
    temporal jitter across epochs, device RandomResizedCrop keeps its
    spatial freedom (data/clip_cache.py). Same decomposition fields as
    the pretrain loader row."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from clover_tpu.data.datasets import VideoTextDataset
    from clover_tpu.data.loader import DataLoader, prefetch_to_device
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab
    from clover_tpu.engine import TrainState, make_optimizer
    from clover_tpu.engine.steps import make_retrieval_train_step
    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )
    from clover_tpu.ops.preprocess import preprocess_clips

    B = int(os.environ.get("BENCH_BATCH", 16))
    T = int(os.environ.get("BENCH_FRAMES", 12))
    N_BATCHES = int(os.environ.get("BENCH_ITERS", 8))
    WORKERS = int(os.environ.get("BENCH_WORKERS", 4))
    BACKEND = os.environ.get("BENCH_LOADER_BACKEND", "packed")
    CANON, OUT, L = 256, 224, 30
    n = N_BATCHES * B

    words = ("person dog cat car street park water table chair light "
             "runs walks jumps holds opens closes looks plays sits stands "
             "red blue green small large old young quick slow happy").split()
    cap_rng = np.random.default_rng(0)
    records = []
    for i in range(n):
        cap = " ".join(cap_rng.choice(words, size=int(cap_rng.integers(6, 12))))
        records.append({"filename": f"bench_video_{i}.mp4", "text": cap})
    tok = BertTokenizer(build_test_vocab(words))

    backend, backend_kwargs = "synthetic", {"height": 240, "width": 320,
                                            "length": 64}
    if BACKEND == "packed":
        from clover_tpu.data.clip_cache import ClipCache, build_clip_cache
        from clover_tpu.data.decode import SyntheticVideoBackend

        stem = os.environ.get(
            "BENCH_LOADER_ROOT",
            os.path.join(tempfile.gettempdir(),
                         f"bench_ftpack_T{2 * T}_S{CANON}"))
        need = True
        if os.path.exists(stem + ".json") and os.path.exists(stem + ".bin"):
            c = ClipCache(stem)
            need = not (len(c) >= n and c.frames == 2 * T
                        and c.height == CANON and c.layout == "thwc")
        if need:
            build_clip_cache(stem, [r["filename"] for r in records],
                             SyntheticVideoBackend(**backend_kwargs),
                             num_frames=2 * T, size=CANON)
        backend, backend_kwargs = "packed", {"path": stem}

    ds = VideoTextDataset(records=records, tokenizer=tok, num_frames=T,
                          canonical_size=CANON, max_length=L,
                          backend=backend, backend_kwargs=backend_kwargs)
    REUSE = int(os.environ.get("BENCH_REUSE_BUFFERS", 6))
    loader = DataLoader(ds, batch_size=B, shuffle=False, drop_last=True,
                        num_workers=WORKERS, reuse_buffers=REUSE)

    cfg = FinetuneConfig(
        swin=SwinConfig.base(),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def to_model(imgs_u8, boxes, flip):
        x = preprocess_clips(imgs_u8.reshape((-1,) + imgs_u8.shape[2:]),
                             boxes, flip, out_size=OUT, dtype=jnp.bfloat16)
        return x.reshape(imgs_u8.shape[:2] + x.shape[1:])

    def model_batch(b):
        return {
            "imgs": to_model(b["imgs"], b["crop_boxes"], b["flip"]),
            "token_ids": b["token_ids"],
            "input_mask": b["input_mask"],
        }

    first_host = next(iter(loader.epoch(0)))
    first = model_batch(jax.tree_util.tree_map(jnp.asarray, first_host))
    params = jax.jit(lambda k, b: model.init(k, b, train=False)["params"])(
        jax.random.PRNGKey(0), first)
    jax.block_until_ready(params)
    tx, _ = make_optimizer(params, base_lr=1.2e-5, total_steps=1000,
                           warmup_steps=10)
    state = TrainState.create(params, tx)
    del params
    step = jax.jit(make_retrieval_train_step(model, jit=False,
                                             grad_clip_norm=15.0),
                   donate_argnums=0)
    key = jax.random.key(1, impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg"))
    state, metrics = step(state, first, key)        # warm the compile
    np.asarray(metrics["loss"])
    del first

    probe = np.ascontiguousarray(first_host["imgs"])
    jax.device_put(probe).block_until_ready()
    t0 = time.time()
    np.asarray(jnp.max(jax.device_put(probe)))
    h2d_mbps = probe.nbytes / (time.time() - t0) / 2 ** 20
    bytes_per_clip = probe.nbytes / probe.shape[0]

    t0 = time.time()
    n_seen = 0
    for b in loader.epoch(0):
        n_seen += b["imgs"].shape[0]
    loader_dt = time.time() - t0

    losses = []
    t0 = time.time()
    for b in prefetch_to_device(loader.epoch(0), size=2):
        state, metrics = step(state, model_batch(b), key)
        losses.append(metrics["loss"])
    losses = np.asarray([np.asarray(x) for x in losses])
    combined_dt = time.time() - t0
    assert np.all(np.isfinite(losses))

    staged = [jax.tree_util.tree_map(jnp.asarray, b) for b in loader.epoch(0)]
    t0 = time.time()
    for b in staged:
        state, metrics = step(state, model_batch(b), key)
    np.asarray(metrics["loss"])
    device_dt = time.time() - t0

    print(json.dumps({
        "metric": "finetune_train_loader_in_loop_clips_per_sec_per_chip",
        "value": round(n_seen / combined_dt, 3),
        "unit": "clips/s",
        "vs_baseline": None,
        "batch": B,
        "frames": T,
        "batches": N_BATCHES,
        "workers": WORKERS,
        "loader_backend": BACKEND,
        "seconds": round(combined_dt, 3),
        "loader_only_clips_per_sec": round(n_seen / loader_dt, 3),
        "device_only_clips_per_sec": round(n_seen / device_dt, 3),
        "device_idle_frac": round(max(0.0, 1.0 - device_dt / combined_dt), 4),
        "h2d_MBps": round(h2d_mbps, 1),
        "h2d_bound_clips_per_sec": round(h2d_mbps * 2 ** 20 / bytes_per_clip,
                                         1),
        "device": str(jax.devices()[0]),
    }))


def bench_vmem_audit():
    """BENCH_MODE=vmem_audit: run the per-round kernel-picker VMEM audit
    (tools/vmem_audit.py — every shipped kernel shape must compile when
    its picker says feasible) and the train-recipe HBM audit
    (tools/hbm_audit.py — shipped recipes must fit; boundary recipes
    document the OOM cliff), emitting one JSON line for the driver.
    Closes VERDICT r3 #6: both audits now run in the bench environment
    where a chip is attached, not by hand."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    results = {}
    # hbm-scan: compile the SHIPPED recipes' FULL lax.scan programs — the
    # only compile that sees full-program placement failures like the
    # 8f-B24 scoped-VMEM overflow (r4/r5; ~10 min/recipe on the relay).
    # BENCH_SCAN_AUDIT=0 skips for a quick kernel-only audit.
    suites = [("vmem", ["tools/vmem_audit.py"]),
              ("hbm", ["tools/hbm_audit.py"])]
    if os.environ.get("BENCH_SCAN_AUDIT", "1") == "1":
        suites.append(("hbm-scan", ["tools/hbm_audit.py", "--scan",
                                    "--recipes", "8f-B16,32f-B8-remat01"]))
    for name, argv in suites:
        argv = [os.path.join(here, argv[0])] + argv[1:]
        proc = subprocess.run(
            [sys.executable] + argv, env=env,
            capture_output=True, text=True, timeout=3600)
        results[name] = {
            "ok": proc.returncode == 0,
            "tail": proc.stdout.strip().splitlines()[-1] if proc.stdout
            else proc.stderr.strip().splitlines()[-1][:200],
        }
    failures = sum(0 if r["ok"] else 1 for r in results.values())
    print(json.dumps({
        "metric": "kernel_vmem_hbm_audit_failed_suites",
        "value": failures,
        "unit": "suites",
        "vs_baseline": None,
        **results,
    }))
    sys.exit(1 if failures else 0)


def main():
    mode = os.environ.get("BENCH_MODE", "eval")
    if mode == "vmem_audit":
        bench_vmem_audit()
        return
    if mode == "train":
        if os.environ.get("BENCH_INPUT") == "loader":
            bench_loader_train()
            return
        bench_train()
        return
    if mode == "finetune":
        if os.environ.get("BENCH_INPUT") == "loader":
            bench_loader_finetune()
            return
        bench_finetune()
        return
    if mode == "itm":
        bench_itm()
        return
    if mode == "serving":
        bench_serving()
        return
    if os.environ.get("BENCH_INPUT") == "loader":
        bench_loader_eval()
        return
    import jax
    import jax.numpy as jnp

    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )
    from clover_tpu.ops.preprocess import eval_preprocess

    # batch sweep (2026-08-17, all kernels on): B=16 -> 438.7, B=32 ->
    # 462.5, B=64 -> 425.7 clips/s; default the sweet spot (retrieval
    # eval batches freely — MSRVTT 1k-A is 1000 clips)
    B = int(os.environ.get("BENCH_BATCH", 32))
    T = int(os.environ.get("BENCH_FRAMES", 8))
    ITERS = int(os.environ.get("BENCH_ITERS", 16))
    ATTN = os.environ.get("BENCH_ATTN", "auto")
    S = 224

    fold_norm = os.environ.get("BENCH_FOLD_NORM", "1") == "1"
    cfg = FinetuneConfig(
        swin=SwinConfig.base(
            attention_impl=ATTN,
            # host_s2d: loader-side space-to-depth (data.loader
            # make_s2d_collate) + normalize folded into the embed GEMM —
            # measured +4.7% at 32-frame over conv+fold (BASELINE.md)
            embed_impl=os.environ.get("BENCH_EMBED", "host_s2d"),
            fused_mlp=os.environ.get("BENCH_MLP", "pallas") != "xla",
            fold_normalize=fold_norm,
            window_resident=os.environ.get("BENCH_WIN_RESIDENT", "1") == "1"),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # ITERS distinct batches staged in HBM; the whole benchmark is ONE
    # device dispatch (lax.scan) so the per-call relay overhead (~34 ms
    # measured on this image) and async-dispatch ambiguity cannot distort
    # the number. This models a real eval loop whose input pipeline is
    # prefetched/overlapped.
    frames_all = jnp.asarray(rng.integers(
        0, 256, size=(ITERS, B, T, S, S, 3), dtype=np.uint8))
    token_all = jnp.asarray(
        rng.integers(0, 30522, size=(ITERS, B, 30)), jnp.int32)
    input_mask = jnp.ones((B, 30), jnp.int32)

    if cfg.swin.embed_impl == "host_s2d":
        # loader-side space-to-depth (preprocess.space_to_depth_host): the
        # device sees (B, T/2, 56, 56, 96) u8 and the embed is one GEMM
        from clover_tpu.ops.preprocess import space_to_depth_host

        frames_all = jnp.asarray(space_to_depth_host(np.asarray(frames_all)))

    def one_batch(params, frames_u8, token_ids, bias_cache):
        if cfg.swin.embed_impl == "host_s2d":
            imgs = frames_u8          # cast happens inside the backbone
        else:
            # fold_normalize: the mean/std affine rides inside the
            # patch-embed projection; preprocessing is a pure u8->bf16 cast
            imgs = eval_preprocess(frames_u8, out_size=S, dtype=jnp.bfloat16,
                                   normalize=not fold_norm)
        return model.apply(params, imgs[:, None], token_ids, input_mask,
                           bias_cache, method="forward_test")

    if cfg.swin.embed_impl == "host_s2d":
        init_imgs = frames_all[0]
    else:
        init_imgs = eval_preprocess(frames_all[0], out_size=S,
                                    dtype=jnp.bfloat16,
                                    normalize=not fold_norm)
    # NOTE: everything large must be an ARGUMENT of the jitted fns —
    # closed-over arrays become HLO constants and blow up the remote-compile
    # request on this image (HTTP 413).
    params = jax.jit(
        lambda k, imgs, tok: model.init(k, imgs[:, None], tok, input_mask,
                                        method="forward_test")
    )(jax.random.PRNGKey(0), init_imgs, token_all[0])
    jax.block_until_ready(params)
    # precomputed relative-position biases: eval-time constants — as a scan
    # constant the per-iteration table gathers disappear (~6 ms/iter at
    # 32 frames; swin3d.swin_bias_cache)
    from clover_tpu.models.swin3d import swin_bias_cache

    bias_cache = jax.jit(lambda p: swin_bias_cache(
        p["params"]["backbone"], cfg.swin, (T, S, S)))(params)

    @jax.jit
    def run_all(params, frames_all, token_all, bias_cache):
        def body(carry, inp):
            v, t = one_batch(params, *inp, bias_cache)
            return carry + v.astype(jnp.float32).sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), (frames_all, token_all))
        return total

    out = float(run_all(params, frames_all, token_all, bias_cache))  # compile + warm
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:  # steady-state-only trace (tools/profile_bench.py)
        jax.profiler.start_trace(trace_dir)

    def timed():
        t0 = time.time()
        out = float(run_all(params, frames_all, token_all, bias_cache))
        assert np.isfinite(out)
        return time.time() - t0

    dt, dts = _timed_runs(timed, int(os.environ.get("BENCH_REPEAT", 1)))
    if trace_dir:
        jax.profiler.stop_trace()
    clips_per_sec = B * ITERS / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench", "baseline_measured.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = clips_per_sec / base["value"]

    print(json.dumps({
        "metric": "msrvtt_eval_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        # vs the only baseline measurable in this image: 1-core eager
        # torch CPU (bench/baseline_measured.json). This is NOT the
        # "5x GPU reference" north star — no GPU exists here; see
        # BASELINE.md for what this does and does not evidence.
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "baseline_kind": "torch_cpu_1core_eager",
        "batch": B,
        "frames": T,
        "iters": ITERS,
        "seconds": round(dt, 3),
        "runs": [round(B * ITERS / d, 1) for d in dts] if len(dts) > 1 else None,
        "attention_impl": ATTN,
        "device": str(jax.devices()[0]),
        **_flops_fields(run_all, (params, frames_all, token_all, bias_cache),
                        dt, iters=ITERS),
    }))


if __name__ == "__main__":
    main()
