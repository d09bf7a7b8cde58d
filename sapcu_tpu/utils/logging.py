"""Training observability: log.txt + scalar streams (+ TensorBoard).

Mirrors the reference's logging surface (SURVEY.md §5.5): an appending
plain-text ``log.txt`` (trainfn.py:57-62), TensorBoard scalars under
``<out_dir>/logs`` via tensorboardX when available, and — always — a
greppable ``scalars.jsonl`` so runs are machine-readable without TB.
"""
from __future__ import annotations

import json
import os
import time


class RunLogger:
    def __init__(self, out_dir: str, use_tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.logfile = open(os.path.join(out_dir, "log.txt"), "a")
        self.scalars = open(os.path.join(out_dir, "scalars.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(os.path.join(out_dir, "logs"))
            except Exception:
                self.tb = None

    def message(self, msg: str) -> None:
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
        print(line, flush=True)
        self.logfile.write(line + "\n")
        self.logfile.flush()

    def add_scalar(self, tag: str, value, step: int) -> None:
        v = float(value)
        self.scalars.write(json.dumps({"tag": tag, "value": v, "step": step}) + "\n")
        if self.tb is not None:
            self.tb.add_scalar(tag, v, step)

    def add_scalars(self, prefix: str, values: dict, step: int) -> None:
        for k, v in values.items():
            try:
                self.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self) -> None:
        self.scalars.flush()
        if self.tb is not None:
            self.tb.flush()

    def close(self) -> None:
        self.flush()
        self.logfile.close()
        self.scalars.close()
        if self.tb is not None:
            self.tb.close()
