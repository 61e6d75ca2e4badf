"""Training orchestration: epochs, interleaved loaders, eval, checkpoints.

An explicit loop replacing the reference's runner+hook bus (SURVEY.md
§7.1). Feature parity with the hooks that matter:
- per-iter metrics logging with psum'd log vars (MetricsLogger)
- eval every N epochs + best-checkpoint tracking
  (MyDistEvalHook, my_eval_hook.py:404-880)
- periodic checkpoint + resume (MYCheckpointHook / runner.resume)
- EMA via TrainState.ema_params (EMA hooks, core/hooks/ema.py)
- multi-dataset interleaving: one optimizer step per loader per
  iteration, shorter loader re-iterated, epoch = longest loader
  (MyEpochBasedMultiDatasetRunner, clover_runner.py:56-161)
"""

from __future__ import annotations

import itertools
import signal
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from clover_tpu.engine.checkpoint import CheckpointManager
from clover_tpu.utils.logging import MetricsLogger


def interleave_loaders(loaders: Sequence, epoch: int):
    """Yield (loader_idx, batch) one per loader per step; shorter loaders
    restart, epoch length = longest loader (reference
    MyEpochBasedMultiDatasetRunner, clover_runner.py:76-93).

    Re-iteration uses a per-loader sub-epoch counter folded into the
    shuffle seed as ``epoch * n_loaders_restarts`` would collide; instead
    each restart r of loader li draws epoch key ``(epoch, li, r)`` hashed
    into a disjoint int — exact even for real epochs >= 1000, and each
    restart gets a fresh deterministic order."""
    import zlib

    iters = [iter(ld.epoch(epoch)) for ld in loaders]
    lengths = [len(ld) for ld in loaders]
    restarts = [0] * len(loaders)
    for _ in range(max(lengths)):
        for li, ld in enumerate(loaders):
            try:
                batch = next(iters[li])
            except StopIteration:
                restarts[li] += 1
                sub = zlib.crc32(
                    f"{epoch}:{li}:{restarts[li]}".encode()) % (2 ** 31)
                iters[li] = iter(ld.epoch(sub))  # re-iterate, fresh order
                batch = next(iters[li])
            yield li, batch


class Trainer:
    def __init__(
        self,
        state,
        train_steps: Sequence[Callable],       # one per train loader
        train_loaders: Sequence,
        batch_to_device: Callable,             # host batch -> model batch
        rng: jax.Array,
        total_epochs: int,
        work_dir: Optional[str] = None,
        log_interval: int = 20,
        eval_fn: Optional[Callable] = None,    # (state) -> metrics dict
        eval_interval: int = 1,
        save_best_key: Optional[str] = None,
        ckpt_interval: int = 1,
        ckpt_manager: Optional[CheckpointManager] = None,
        ema_eval: bool = False,
        tensorboard: bool = False,
    ):
        assert len(train_steps) == len(train_loaders)
        self.state = state
        self.train_steps = list(train_steps)
        self.train_loaders = list(train_loaders)
        self.batch_to_device = batch_to_device
        self.rng = rng
        self.total_epochs = total_epochs
        self.metrics = MetricsLogger(work_dir, tensorboard=tensorboard)
        self.log_interval = log_interval
        self.eval_fn = eval_fn
        self.eval_interval = eval_interval
        self.save_best_key = save_best_key
        self.ckpt_interval = ckpt_interval
        self.ckpt = ckpt_manager
        self.ema_eval = ema_eval
        self.start_epoch = 0
        self._epoch = 0  # current epoch, recorded in preemption ckpt meta

    def resume(self) -> bool:
        if self.ckpt is None:
            return False
        restored = self.ckpt.restore(self.state)
        if restored is None:
            return False
        self.state = restored
        meta = self.ckpt.read_meta()
        if meta is not None and "epoch" in meta:
            # Epoch round-tripped through checkpoint meta (reference
            # epoch_based_runner.py:169-201): end-of-epoch saves resume at
            # epoch+1; mid-epoch preemption saves redo the epoch. Robust to
            # loader lengths changing across the resume.
            self.start_epoch = int(meta["epoch"]) + (
                0 if meta.get("preempted") else 1)
        else:
            # Legacy checkpoints without meta: assume constant steps/epoch.
            steps_per_epoch = max(len(ld) for ld in self.train_loaders)
            self.start_epoch = int(self.state.step) // max(
                1, steps_per_epoch * len(self.train_loaders))
        self.metrics.log({"resumed_step": int(self.state.step),
                          "resumed_epoch": self.start_epoch})
        return True

    def _eval_params(self):
        if self.ema_eval and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    def _install_preemption_handler(self):
        """Save a checkpoint on SIGTERM/SIGINT before exiting (preemption
        safety — the reference has no recovery story beyond resume,
        SURVEY.md §5.3)."""
        if self.ckpt is None:
            return

        def handler(signum, _frame):
            self.metrics.log({"preempted_signal": signum,
                              "step": int(self.state.step)})
            self.ckpt.save(self.state, meta={"preempted": True,
                                             "epoch": self._epoch})
            raise SystemExit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # not in main thread

    def fit(self):
        self._install_preemption_handler()
        window: List[Dict[str, float]] = []
        t_last = time.time()
        for epoch in range(self.start_epoch, self.total_epochs):
            self._epoch = epoch
            for li, host_batch in interleave_loaders(self.train_loaders, epoch):
                batch = self.batch_to_device(li, host_batch)
                self.state, metrics = self.train_steps[li](
                    self.state, batch, self.rng)
                window.append({k: float(v) for k, v in metrics.items()})
                step = int(self.state.step)
                if step % self.log_interval == 0:
                    avg = {
                        k: float(np.mean([m[k] for m in window if k in m]))
                        for k in window[-1]
                    }
                    dt = time.time() - t_last
                    avg["steps_per_sec"] = len(window) / max(dt, 1e-9)
                    avg["epoch"] = epoch
                    self.metrics.log(avg, step=step, prefix="train ")
                    window.clear()
                    t_last = time.time()

            if self.eval_fn is not None and (epoch + 1) % self.eval_interval == 0:
                eval_metrics = self.eval_fn(self._eval_params())
                self.metrics.log(eval_metrics, step=int(self.state.step),
                                 prefix=f"eval[ep{epoch}] ")
                if self.ckpt is not None and self.save_best_key is not None:
                    if self.ckpt.update_best(
                        int(self.state.step), self.save_best_key,
                        float(eval_metrics[self.save_best_key])):
                        self.ckpt.save(self.state, meta={
                            "epoch": epoch, "best": True, **eval_metrics})

            if self.ckpt is not None and (epoch + 1) % self.ckpt_interval == 0:
                self.ckpt.save(self.state, meta={"epoch": epoch})
        return self.state
