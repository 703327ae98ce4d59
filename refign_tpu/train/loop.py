"""Shared fit-loop bookkeeping for SegTask / AlignTask.

The two tasks' training loops differ only in how a step runs (UDA step
with host-side adapt_to_ref coin vs. plain alignment step); the cadence
machinery — jsonl + TensorBoard logging, steps/sec, val/checkpoint
intervals, the final checkpoint — is identical and lives here once.
(Replaces the reference's Lightning Trainer callbacks: logging per
``self.log``, ValEveryNSteps, ModelCheckpoint(save_last).)
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict

import jax

from ..utils.checkpoint import save_checkpoint


class FitBookkeeper:
    """Owns log/val/ckpt cadence for a step-indexed training loop.

    Args:
      workdir: run directory (metrics.jsonl, tb/, checkpoints/ under it).
      trainer_cfg: reference-schema trainer dict (max_steps,
        val_every_n_steps, log_every_n_steps).
      sched_fn: step -> learning rate (for the lr monitor column).
      evaluate: host_state -> metrics dict, called at val intervals.
      default_max_steps: fallback when the config omits max_steps.
    """

    def __init__(self, workdir: str, trainer_cfg: Dict[str, Any],
                 sched_fn: Callable[[int], Any],
                 evaluate: Callable[[Any], Dict[str, float]],
                 default_max_steps: int):
        os.makedirs(workdir, exist_ok=True)
        cfg = trainer_cfg or {}
        self.max_steps = int(cfg.get("max_steps", default_max_steps))
        # reference-schema configs carry the cadence in
        # trainer.callbacks ValEveryNSteps.init_args.every_n_steps
        # (helpers/callbacks.py:6-27) — honor it rather than silently
        # running a full 40k-step fit with no intermediate val/checkpoint
        val_every = cfg.get("val_every_n_steps")
        if val_every is None:
            for cb in (cfg.get("callbacks") or []):
                if (isinstance(cb, dict) and str(cb.get(
                        "class_path", "")).endswith("ValEveryNSteps")):
                    val_every = (cb.get("init_args") or {}).get(
                        "every_n_steps")
        self.val_every = int(val_every or self.max_steps)
        self.log_every = int(cfg.get("log_every_n_steps", 50))
        self.ckpt_dir = os.path.join(workdir, "checkpoints")
        self._sched_fn = sched_fn
        self._evaluate = evaluate
        self._logf = open(os.path.join(workdir, "metrics.jsonl"), "a")
        from ..utils.tb_logger import TensorBoardLogger
        self._tb = TensorBoardLogger(os.path.join(workdir, "tb"))
        self._t0 = time.time()

    def on_step(self, step: int, start_step: int, state, logs) -> None:
        """Call once per optimizer step with the device state and logs."""
        if (step + 1) % self.log_every == 0 or step == start_step:
            logs = {k: float(v) for k, v in logs.items()}
            logs.update(step=step + 1,
                        lr=float(self._sched_fn(step)),
                        sps=(step + 1 - start_step)
                        / max(time.time() - self._t0, 1e-9))
            print(f"[fit] {json.dumps(logs)}", flush=True)
            self._logf.write(json.dumps(logs) + "\n")
            self._logf.flush()
            self._tb.log_scalars(logs, step + 1)
        if (step + 1) % self.val_every == 0 or step + 1 == self.max_steps:
            host_state = jax.device_get(state)  # one d2h for val + ckpt
            metrics = self._evaluate(host_state)
            print(f"[val] step {step + 1}: {metrics}", flush=True)
            self._logf.write(json.dumps({"step": step + 1, **metrics})
                             + "\n")
            self._logf.flush()
            self._tb.log_scalars(metrics, step + 1)
            save_checkpoint(self.ckpt_dir, host_state, step + 1)

    def finish(self, state) -> Dict[str, float]:
        save_checkpoint(self.ckpt_dir, jax.device_get(state),
                        self.max_steps)
        self._logf.close()
        self._tb.close()
        return {"final_step": self.max_steps}
