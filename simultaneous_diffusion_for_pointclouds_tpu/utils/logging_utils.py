"""Metrics logging: TensorBoard (when available) + always-on JSONL.

The reference logs ``loss``/``test_loss`` scalars to TensorBoard
(main.py:53,81; ncsn_runner.py:126-166).  We mirror that and additionally
append every scalar to ``metrics.jsonl`` so headless runs stay inspectable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def setup_logging(log_path: Optional[str] = None, level: str = "info") -> None:
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_path:
        os.makedirs(log_path, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(log_path, "stdout.txt")))
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(levelname)s - %(filename)s - %(asctime)s - %(message)s",
        handlers=handlers,
        force=True,
    )


class MetricsLogger:
    def __init__(self, log_dir: Optional[str]):
        self._tb = None
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:  # tensorboard optional
                self._tb = None

    def scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": value, "step": step, "t": time.time()})
                + "\n"
            )
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
