"""Metrics: JSONL + TensorBoard scalar logging.

Replaces tensorboardX usage (``vqwae_train.py:790-796,866-872``). JSONL is
the source of truth (greppable, no deps); TensorBoard event files are
written too when tensorboardX is importable.
"""
from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsWriter:
    def __init__(self, log_dir: str | Path, use_tensorboard: bool = True):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.dir))
            except Exception:
                self._tb = None

    def scalars(self, step: int, phase: str, values: dict) -> None:
        rec = {"step": int(step), "phase": phase, "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{phase} {k}", float(v), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
