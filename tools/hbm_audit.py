#!/usr/bin/env python
"""HBM-side audit of the pretrain train-step recipes (VERDICT r3 #6).

The r3 kernel generation silently moved the HBM OOM cliff (B=8 32-frame
remat-0,1 fit in r2, OOMs post-r3 — found only by re-sweep). TPU memory
is allocated statically at compile time, so the cliff is fully visible
without running a step: this tool compiles each recipe's train step
(abstract operands via jax.eval_shape — no host data) and reports the
executable's memory_analysis (arguments / outputs / temps / total) vs
the chip's HBM, flagging OOMs and <5% headroom.

Run on TPU:
  python tools/hbm_audit.py                 # shipped + boundary recipes
  python tools/hbm_audit.py --recipes 8f-B16,32f-B4
Exit code 1 if any SHIPPED recipe fails to compile.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# (label, B, T, remat, shipped) — shipped recipes MUST fit; boundary ones
# document where the cliff sits this round (BASELINE.md r3/r4 sweeps)
RECIPES = [
    ("8f-B16", 16, 8, False, True),          # pretrain train recipe
    ("8f-B24", 24, 8, False, False),         # r4: scoped-VMEM boundary in the
    # full B=24 scan program (XLA output-in-VMEM placement effect, NOT the
    # kernel picker — see BASELINE.md); the single-step compile here may pass
    ("8f-B32", 32, 8, False, False),         # OOM boundary (r2/r3 sweeps)
    ("32f-B4", 4, 32, False, True),          # 32-frame fallback recipe
    ("32f-B8-remat01", 8, 32, (0, 1), True),  # 32-frame recipe since r4
    # (fits under the production step's donation; the non-donated r3
    # bench scan OOM'd here — BASELINE.md 2026-08-20)
]


# explicit user value wins over the per-recipe default below
_USER_STASH = os.environ.get("CLOVER_MLP_STASH")


def build(B, T, remat):
    # mirror the launchers (bench.py / builder.build_model): the MLP
    # z-stash is a wash under remat and its residency HBM-OOMs the 32f
    # recipe — audit what actually ships, per recipe (the knob is read at
    # trace time)
    os.environ["CLOVER_MLP_STASH"] = (
        _USER_STASH if _USER_STASH is not None else ("0" if remat else "1"))
    import jax.numpy as jnp

    from clover_tpu.models import (
        BertConfig,
        CloverPretrain,
        FusionConfig,
        PretrainConfig,
        SwinConfig,
    )

    cfg = PretrainConfig(
        swin=SwinConfig.base(mask_token=True,
                             use_checkpoint=remat if remat else False),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
    )
    model = CloverPretrain(cfg, dtype=jnp.bfloat16)
    L, S = 30, 224
    batch = {
        "imgs": np.zeros((B, 1, T, S, S, 3), np.float32),
        "token_ids": np.zeros((B, L), np.int32),
        "input_mask": np.ones((B, L), np.int32),
        "mlm_label": np.full((B, L), -100, np.int32),
        "v_token_mask": np.zeros((B, 7, 7), np.int32),
    }
    return model, batch


def _compile_error_row(label, e, scan):
    """Compact, actionable error row: first line + the scoped-VMEM /
    largest-allocation detail lines XLA appends (buffer name + size),
    so a placement overflow names its buffer in the audit artifact."""
    lines = str(e).splitlines()
    detail = [l.strip() for l in lines[1:40]
              if any(k in l.lower() for k in
                     ("vmem", "allocation", "largest", "%", "bytes"))][:6]
    return {"label": label, "ok": False, "scan": scan,
            "error": lines[0][:140] if lines else repr(e)[:140],
            "detail": detail}


def audit_one(label, B, T, remat, hbm_bytes, scan=False, scan_iters=8):
    """Compile the recipe's train step — and, with ``scan=True``, the FULL
    lax.scan program the bench/trainer actually runs (donated carried
    state, scan_iters steps). VERDICT r4 item 6: the 8f-B24 scoped-VMEM
    overflow appears ONLY in the full scan program (XLA placed a kernel
    output in VMEM); a bare single-step compile passes, so the audit must
    compile what runs."""
    import jax

    from clover_tpu.engine import TrainState, make_optimizer
    from clover_tpu.engine.steps import make_pretrain_train_step

    model, batch = build(B, T, remat)
    batch_s = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch)
    params_s = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)["params"],
        batch_s)
    tx, _ = make_optimizer(params_s, base_lr=5e-5, total_steps=1000,
                           warmup_steps=10)
    state_s = jax.eval_shape(lambda p: TrainState.create(p, tx), params_s)
    step = make_pretrain_train_step(model, jit=False, grad_clip_norm=15.0)
    key = jax.random.key(1, impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg"))
    try:
        if scan:
            import jax.numpy as jnp

            scan_batch_s = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct((scan_iters,) + a.shape,
                                               a.dtype), batch_s)

            def run_all(state, batches, key):
                def body(state, b):
                    state, metrics = step(state, b, key)
                    return state, metrics["loss"]
                return jax.lax.scan(body, state, batches)

            compiled = jax.jit(run_all, donate_argnums=0).lower(
                state_s, scan_batch_s, key).compile()
        else:
            compiled = jax.jit(step, donate_argnums=0).lower(
                state_s, batch_s, key).compile()
    except Exception as e:  # noqa: BLE001 — report any compile failure
        return _compile_error_row(label, e, scan)
    mem = compiled.memory_analysis()
    row = {
        "label": label,
        "ok": True,
        "scan": scan,
        "args_gb": round(mem.argument_size_in_bytes / 2 ** 30, 2),
        "out_gb": round(mem.output_size_in_bytes / 2 ** 30, 2),
        "temp_gb": round(mem.temp_size_in_bytes / 2 ** 30, 2),
        "alias_gb": round(mem.alias_size_in_bytes / 2 ** 30, 2),
    }
    # live peak: args + outputs + temps - donated/aliased buffers
    peak = (mem.argument_size_in_bytes + mem.output_size_in_bytes
            + mem.temp_size_in_bytes - mem.alias_size_in_bytes)
    row["peak_gb"] = round(peak / 2 ** 30, 2)
    if hbm_bytes:
        row["headroom_frac"] = round(1.0 - peak / hbm_bytes, 3)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", default=None,
                    help="comma-separated label filter")
    ap.add_argument("--scan", action="store_true",
                    help="compile the FULL lax.scan program per recipe "
                         "(catches full-program-only placement failures "
                         "like the 8f-B24 scoped-VMEM overflow; ~6 min "
                         "compile per recipe on the relay)")
    ap.add_argument("--scan-iters", type=int, default=8,
                    help="scan length for --scan (bench uses 8)")
    args = ap.parse_args()
    import jax

    dev = jax.devices()[0]
    hbm = getattr(dev, "memory_stats", lambda: None)()
    hbm_bytes = (hbm or {}).get("bytes_limit", 0)
    print(f"device: {dev}  HBM limit: "
          f"{hbm_bytes / 2 ** 30:.1f} GiB" if hbm_bytes else f"device: {dev}")
    failed_shipped = 0
    for label, B, T, remat, shipped in RECIPES:
        if args.recipes and label not in args.recipes.split(","):
            continue
        row = audit_one(label, B, T, remat, hbm_bytes, scan=args.scan,
                        scan_iters=args.scan_iters)
        row["shipped"] = shipped
        print(json.dumps(row), flush=True)
        if shipped and not row["ok"]:
            failed_shipped += 1
    print(f"{'AUDIT FAIL' if failed_shipped else 'AUDIT OK'}: "
          f"{failed_shipped} shipped recipes failed to compile")
    sys.exit(1 if failed_shipped else 0)


if __name__ == "__main__":
    main()
