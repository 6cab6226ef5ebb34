"""Logging / metrics / profiling — first-class here, unlike the reference's
bare `log_string` file prints (train/train_sdf.py:100-101, 148-151;
SURVEY.md §5.1/§5.5).

MetricLogger writes three sinks: stdout, a flushed text log (log_train.txt
parity), and a machine-readable metrics.jsonl. Timer gives per-phase
wall-clock with EMA. trace() wraps jax.profiler for on-demand TPU traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Any


class MetricLogger:
    def __init__(self, log_dir: str | None = None, name: str = "train",
                 stdout: bool = True):
        self.stdout = stdout
        self.txt = None
        self.jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.txt = open(os.path.join(log_dir, f"log_{name}.txt"), "a")
            self.jsonl = open(os.path.join(log_dir, f"metrics_{name}.jsonl"),
                              "a")

    def log(self, msg: str) -> None:
        if self.stdout:
            print(msg, flush=True)
        if self.txt:
            self.txt.write(msg + "\n")
            self.txt.flush()

    def metrics(self, step: int, values: dict[str, Any], **extra) -> None:
        rec = {"step": int(step), "time": time.time(), **extra}
        for k, v in values.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        if self.jsonl:
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        pretty = " ".join(f"{k}={rec[k]:.6g}" for k in values if k in rec
                          and isinstance(rec[k], float))
        self.log(f"step {step}: {pretty}")

    def close(self) -> None:
        for f in (self.txt, self.jsonl):
            if f:
                f.close()


class Timer:
    """Named phase timers with exponential moving averages."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.avg[name] = (self.avg.get(name, dt) * self.ema
                          + dt * (1 - self.ema))

    def summary(self) -> str:
        return " ".join(f"{k}={v * 1e3:.1f}ms" for k, v in self.avg.items())


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def progress(i: int, n: int, every: int = 50) -> bool:
    return i % every == 0 or i == n - 1


def die(msg: str) -> None:
    print(f"error: {msg}", file=sys.stderr)
    raise SystemExit(1)
