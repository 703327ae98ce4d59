"""TensorBoard scalar logging (reference parity: TensorBoardLogger in every
trainer config, e.g. refign_hrda_star.yaml:165-171).

Uses tf.summary when tensorflow is importable; otherwise a no-op (the JSONL
metrics log is always written regardless).
"""
from __future__ import annotations

import os
from typing import Dict, Optional


class TensorBoardLogger:
    def __init__(self, logdir: str):
        self.logdir = logdir
        self._writer = None
        try:
            import tensorflow as tf  # noqa: F401
            os.makedirs(logdir, exist_ok=True)
            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = None

    def log_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in scalars.items():
                try:
                    self._tf.summary.scalar(k, float(v), step=step)
                except (TypeError, ValueError):
                    pass
        self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
