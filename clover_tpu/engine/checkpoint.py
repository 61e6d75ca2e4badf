"""Checkpoint save/restore (orbax) + best-checkpoint bookkeeping.

Equivalent surface of the reference's save/resume stack
(TimerEpochBasedRunner.save_checkpoint, MYCheckpointHook, eval-hook best
tracking — SURVEY.md §5.4): a step-keyed orbax directory of the full
train-state pytree plus a small json of metadata, best-metric pruning,
and weights-only load for finetune-from-pretrain.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _state_payload(state) -> Dict[str, Any]:
    payload = {"step": state.step, "params": state.params,
               "opt_state": state.opt_state}
    if state.batch_stats is not None:
        payload["batch_stats"] = state.batch_stats
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    return payload


def merge_pretrained_params(params, pretrained):
    """Weights-only warm-start merge (reference load_from,
    tools/train.py:252-253): top-level tower subtrees whose structure
    matches are taken from ``pretrained``; everything else keeps its fresh
    init (e.g. a converted pretrain checkpoint warm-starting a finetune
    model that adds QA heads). Returns (merged, loaded_keys, fresh_keys)."""
    loaded, fresh = [], []
    merged = dict(params)
    for key in params:
        if key in pretrained and jax.tree_util.tree_structure(
                params[key]) == jax.tree_util.tree_structure(pretrained[key]):
            merged[key] = pretrained[key]
            loaded.append(key)
        else:
            fresh.append(key)
    out = type(params)(merged) if not isinstance(params, dict) else merged
    return out, loaded, fresh


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.async_save = async_save
        self._ckpt = ocp.PyTreeCheckpointer() if _HAVE_ORBAX else None
        self._inflight = None
        # best-metric state cached in memory so every process computes the
        # SAME is_best (only rank 0 has best.json on disk); synced from rank
        # 0 at construction so a resumed multi-process run stays consistent
        self._best = self._read_best_synced()

    def _read_best_synced(self) -> Optional[Dict[str, Any]]:
        best = None
        if os.path.exists(self._best_file()):
            with open(self._best_file()) as f:
                best = json.load(f)
        if jax.process_count() > 1:
            # every rank constructs the manager at the same program point,
            # so this broadcast is aligned across processes
            from jax.experimental import multihost_utils

            has = best is not None
            arr = np.array([float(has),
                            float(best["step"]) if has else 0.0,
                            float(best["value"]) if has else 0.0])
            arr = np.asarray(multihost_utils.broadcast_one_to_all(arr))
            best = ({"step": int(arr[1]), "value": float(arr[2])}
                    if arr[0] > 0.5 else None)
        return best

    def _wait(self):
        if self._inflight is not None:
            self._inflight.join()
            self._inflight = None

    # ------------------------------------------------------------- paths
    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                steps.append(int(name.split("_")[1]))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # ------------------------------------------------------------- save
    def save(self, state, meta: Optional[Dict[str, Any]] = None) -> str:
        """Persist the train state; with async_save=True the device->host
        transfer happens now but disk IO runs on a background thread so the
        train loop keeps stepping (orbax-async style, SURVEY.md §5.3)."""
        self._wait()
        step = int(state.step)
        path = self._path(step)
        payload = _state_payload(state)
        payload = jax.tree_util.tree_map(np.asarray, payload)  # sync snapshot
        multiproc = jax.process_count() > 1

        def write():
            # Orbax save MUST run on every process — it executes
            # cross-process barriers internally and writes from the primary
            # host only (a rank-0-only call deadlocks/desyncs the other
            # ranks' next collective). Shared checkpoint filesystem is the
            # JAX/orbax multi-host convention (GCS on pods); meta json +
            # pruning are plain filesystem ops and stay rank-0-only.
            self._ckpt.save(path, payload, force=True)
            if jax.process_index() == 0:
                with open(os.path.join(self.directory,
                                       f"meta_{step:010d}.json"), "w") as f:
                    json.dump({"step": step, **(meta or {})}, f)
                self._prune()

        if self.async_save and not multiproc:
            # multi-process saves stay synchronous: orbax's barriers must
            # not interleave with the main thread's training collectives
            import threading

            self._inflight = threading.Thread(target=write, daemon=False)
            self._inflight.start()
        else:
            write()
        return path

    def _prune(self):
        steps = self.all_steps()
        best = self._best_step()
        removable = [s for s in steps if s != best]
        while len(removable) > self.max_to_keep:
            victim = removable.pop(0)
            shutil.rmtree(self._path(victim), ignore_errors=True)
            meta = os.path.join(self.directory, f"meta_{victim:010d}.json")
            if os.path.exists(meta):
                os.remove(meta)

    def read_meta(self, step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Metadata json saved alongside a step (epoch, best flags, ...).

        The reference round-trips the epoch through checkpoint meta
        (epoch_based_runner.py:169-201); resume derives start_epoch from
        this rather than assuming constant steps/epoch."""
        self._wait()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        path = os.path.join(self.directory, f"meta_{step:010d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    # ------------------------------------------------------------- best
    def _best_file(self) -> str:
        return os.path.join(self.directory, "best.json")

    def _best_step(self) -> Optional[int]:
        if os.path.exists(self._best_file()):
            with open(self._best_file()) as f:
                return json.load(f).get("step")
        return None

    def update_best(self, step: int, key: str, value: float,
                    greater_is_better: bool = True) -> bool:
        """Track the best eval metric; returns True if this step is new best
        (reference eval-hook best-ckpt logic, my_eval_hook.py:666-736)."""
        best = self._best
        is_best = (
            best is None
            or (value > best["value"]) == greater_is_better
            and value != best["value"]
        )
        if is_best:
            # cache on every rank (eval metrics are identical across ranks,
            # so is_best stays rank-consistent); only rank 0 persists
            self._best = {"step": step, "key": key, "value": value}
            if jax.process_index() == 0:
                with open(self._best_file(), "w") as f:
                    json.dump(self._best, f)
        return is_best

    # ------------------------------------------------------------- load
    def restore(self, state, step: Optional[int] = None):
        """Restore a full train state (resume)."""
        self._wait()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template = jax.tree_util.tree_map(np.asarray, _state_payload(state))
        payload = self._ckpt.restore(self._path(step), item=template)
        new = state.replace(
            step=jax.numpy.asarray(payload["step"]),
            params=payload["params"],
            opt_state=payload["opt_state"],
        )
        if "batch_stats" in payload:
            new = new.replace(batch_stats=payload["batch_stats"])
        if "ema_params" in payload:
            new = new.replace(ema_params=payload["ema_params"])
        return new

    def restore_params(self, params_template, step: Optional[int] = None):
        """Weights-only load (reference load_from, tools/train.py:252-253)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        payload = self._ckpt.restore(self._path(step))
        return payload["params"]
