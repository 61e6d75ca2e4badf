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


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.async_save = async_save
        self._ckpt = ocp.PyTreeCheckpointer() if _HAVE_ORBAX else None
        self._inflight = None

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
        if os.path.exists(path):
            shutil.rmtree(path)

        def write():
            self._ckpt.save(path, payload)
            with open(os.path.join(self.directory,
                                   f"meta_{step:010d}.json"), "w") as f:
                json.dump({"step": step, **(meta or {})}, f)
            self._prune()

        if self.async_save:
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
        best = None
        if os.path.exists(self._best_file()):
            with open(self._best_file()) as f:
                best = json.load(f)
        is_best = (
            best is None
            or (value > best["value"]) == greater_is_better
            and value != best["value"]
        )
        if is_best:
            with open(self._best_file(), "w") as f:
                json.dump({"step": step, "key": key, "value": value}, f)
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
