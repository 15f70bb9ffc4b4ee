"""Structured metrics + logging (SURVEY.md §6 "Metrics / logging" row).

The reference logs loss lines via python logging (+TensorBoard, MED).
Here: a jsonl `MetricsWriter` (one JSON object per step — trivially
machine-readable, the format BENCH/driver tooling consumes) with optional
TensorBoard mirroring when tensorflow is importable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict


def get_logger(name: str = "dmm") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class MetricsWriter:
    """Append-only jsonl metrics sink with optional TensorBoard mirror."""

    def __init__(self, logdir: str, tensorboard: bool = False):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, v, step=step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
