#!/usr/bin/env python
"""Numerics-defaults convergence A/B on the chip (VERDICT r4 item 4).

Four rounds of perf defaults changed training numerics in individually
bounded ways (CLOVER_MLP_BWD_HBM=bf16 backward crossings, rbg dropout
bit-streams, clamp-shift softmax, tanh-gelu); each carries a parity bound
but the *pile* had no end-to-end training-quality check. This tool trains
the SAME fixed synthetic workload for N steps with the production pretrain
step (Swin-B + BERT-base at small batch — the real kernels at real
magnitudes, unlike the CPU debug config) and records the loss trajectory
plus a final retrieval-probe R@1, so shipped-defaults vs exact-knob runs
can be compared against a run-to-run noise yardstick.

Protocol (one process per setting — the knobs are import-time constants):
  # A: shipped defaults
  python tools/convergence_ab.py --steps 200 --out /tmp/ab_defaults.json
  # B: exact knobs (bit-faithful backward/recompute, threefry dropout,
  #    row-max softmax, erf gelu)
  CLOVER_MLP_BWD_HBM=f32 CLOVER_TRAIN_RNG=threefry2x32 CLOVER_WA_NO_MAX=0 \
    python tools/convergence_ab.py --steps 200 --gelu erf --out /tmp/ab_exact.json
  # C: noise yardstick — defaults again with a different seed
  python tools/convergence_ab.py --steps 200 --seed 1 --out /tmp/ab_noise.json
  # verdict
  python tools/convergence_ab.py --compare /tmp/ab_defaults.json \
    /tmp/ab_exact.json /tmp/ab_noise.json

The training signal is real: a fixed pool of --pool batches is cycled, so
the in-batch NCE/MLM objectives are learnable (memorization) and the loss
must fall; the probe scores R@1 over all pool (video, text) pairs through
forward_test. PASS = the exact-knob trajectory deviates from defaults by
no more than the different-seed defaults run does (smoothed curves), and
the probe R@1s agree to within the noise pair's gap.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run(args):
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

    B, T, S, L, K = args.batch, args.frames, 224, 30, args.pool
    cfg = PretrainConfig(
        swin=SwinConfig.base(mask_token=True, gelu=args.gelu),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
    )
    model = CloverPretrain(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(args.seed)
    token_ids = rng.integers(1000, 30000, size=(K, B, L)).astype(np.int32)
    mlm_label = np.full((K, B, L), -100, np.int32)
    mlm_label[:, :, 3] = token_ids[:, :, 3]
    token_ids[:, :, 3] = 103
    pool = {
        "imgs": jnp.asarray(rng.normal(size=(K, B, T, S, S, 3))
                            .astype(np.float32) * 0.5),
        "token_ids": jnp.asarray(token_ids),
        "input_mask": jnp.ones((K, B, L), jnp.int32),
        "mlm_label": jnp.asarray(mlm_label),
        "v_token_mask": jnp.asarray(
            rng.integers(0, 2, (K, B, 7, 7)).astype(np.int32)),
    }
    first = {k: v[0] for k, v in pool.items()}
    params = jax.jit(lambda k, b: model.init(k, b, train=False)["params"])(
        jax.random.PRNGKey(args.seed), first)
    jax.block_until_ready(params)
    tx, _ = make_optimizer(params, base_lr=args.lr,
                           total_steps=args.steps, warmup_steps=10)
    state = TrainState.create(params, tx)
    step = make_pretrain_train_step(model, jit=False, grad_clip_norm=15.0)
    key = jax.random.key(args.seed + 1,
                         impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg"))

    from functools import partial

    # pool rides as a jit ARGUMENT: closed-over arrays become HLO
    # constants, and 300+ MB of constants exceeds the axon relay's
    # remote-compile request limit (HTTP 413 — CLAUDE.md gotcha)
    @partial(jax.jit, donate_argnums=0)
    def run_chunk(state, pool, idx0, key):
        def body(state, i):
            batch = jax.tree_util.tree_map(lambda v: v[i % K], pool)
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
            return state, metrics["loss"]

        return jax.lax.scan(body, state, idx0 + jnp.arange(args.chunk))

    losses = []
    t0 = time.time()
    for c in range(args.steps // args.chunk):
        state, chunk_losses = run_chunk(state, pool,
                                        jnp.int32(c * args.chunk), key)
        chunk_losses = np.asarray(chunk_losses)  # host sync (axon relay)
        assert np.all(np.isfinite(chunk_losses)), chunk_losses
        losses.extend(float(x) for x in chunk_losses)
        print(f"step {len(losses):4d}  loss {losses[-1]:.4f}", flush=True)
    train_s = time.time() - t0

    # retrieval probe: R@1 over the pool's (video, text) pairs
    @jax.jit
    def embed(params, batch):
        return model.apply({"params": params}, batch["imgs"],
                           batch["token_ids"], batch["input_mask"],
                           method="forward_test")

    vs, ts = [], []
    for kdx in range(K):
        batch = {kk: np.asarray(v[kdx]) for kk, v in pool.items()}
        v, t = embed(state.params, batch)
        vs.append(np.asarray(v, np.float32))
        ts.append(np.asarray(t, np.float32))
    v = np.concatenate(vs)
    t = np.concatenate(ts)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    t = t / np.linalg.norm(t, axis=1, keepdims=True)
    sim = v @ t.T
    r1 = float(np.mean(np.argmax(sim, axis=1) == np.arange(len(sim))))

    out = {
        "tag": {k: os.environ.get(k) for k in
                ("CLOVER_MLP_BWD_HBM", "CLOVER_TRAIN_RNG", "CLOVER_WA_NO_MAX",
                 "CLOVER_MLP_STASH", "CLOVER_WA_DEBUG")},
        "gelu": args.gelu, "seed": args.seed, "steps": args.steps,
        "batch": B, "frames": T, "pool": K, "lr": args.lr,
        "losses": [round(x, 5) for x in losses],
        "probe_r_at_1": r1, "train_seconds": round(train_s, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items() if k != "losses"}))


def _smooth(x, w=10):
    x = np.asarray(x, np.float64)
    k = np.ones(w) / w
    return np.convolve(x, k, mode="valid")


def compare(paths):
    runs = [json.load(open(p)) for p in paths]
    a, b, c = runs[0], runs[1], runs[2]
    sa, sb, sc = (_smooth(r["losses"]) for r in (a, b, c))
    n = min(map(len, (sa, sb, sc)))
    gap_ab = float(np.max(np.abs(sa[:n] - sb[:n])))
    gap_ac = float(np.max(np.abs(sa[:n] - sc[:n])))
    r1_ab = abs(a["probe_r_at_1"] - b["probe_r_at_1"])
    r1_ac = abs(a["probe_r_at_1"] - c["probe_r_at_1"])
    # 1.5x head-room on the noise yardstick: three runs only estimate the
    # noise band coarsely
    ok = gap_ab <= 1.5 * max(gap_ac, 0.02) and r1_ab <= max(r1_ac, 0.05)
    print(json.dumps({
        "smoothed_loss_gap_defaults_vs_exact": round(gap_ab, 4),
        "smoothed_loss_gap_seed_noise": round(gap_ac, 4),
        "probe_r1": [a["probe_r_at_1"], b["probe_r_at_1"], c["probe_r_at_1"]],
        "final_losses": [a["losses"][-1], b["losses"][-1], c["losses"][-1]],
        "verdict": "PASS" if ok else "FAIL",
    }))
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--pool", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gelu", default="tanh",
                    help="SwinConfig gelu mode ('tanh' default, 'erf' exact)")
    ap.add_argument("--out", default="/tmp/convergence_ab.json")
    ap.add_argument("--compare", nargs=3, metavar="JSON",
                    help="defaults.json exact.json noise.json -> verdict")
    args = ap.parse_args()
    if args.compare:
        compare(args.compare)
    else:
        run(args)


if __name__ == "__main__":
    main()
