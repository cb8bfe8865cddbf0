"""Observability: gnuplot-style vector dumps and per-block timing traces.

Twin of the reference's logfunc layer (src/logfunc.cpp:14-43 ``logVector``
writing ../data/<name>.dat consumed by data/example.gnuplot) plus the
framework-level additions the reference lacks (SURVEY.md section 5):
a real-time budget tracker and a jax profiler hook.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


def log_vector(name: str, data, out_dir: str = "data",
               index=None) -> str:
    """Dump (index, value) pairs to <out_dir>/<name>.dat (logVector twin)."""
    os.makedirs(out_dir, exist_ok=True)
    data = np.asarray(data).ravel()
    if index is None:
        index = np.arange(len(data))
    path = os.path.join(out_dir, f"{name}.dat")
    with open(path, "w") as f:
        f.write(f"# {name}\n")
        for i, v in zip(np.asarray(index).ravel(), data):
            f.write(f"{i}\t{v:.8g}\n")
    return path


class BlockTimer:
    """Tracks per-block wall clock against the real-time budget."""

    def __init__(self, budget_s: float):
        self.budget = budget_s
        self.times: list[float] = []

    @contextlib.contextmanager
    def block(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def realtime_factor(self) -> float:
        tot = sum(self.times)
        return (self.budget * len(self.times) / tot) if tot else float("inf")

    def summary(self) -> str:
        if not self.times:
            return "no blocks timed"
        arr = np.array(self.times)
        return (f"{len(arr)} blocks: mean {arr.mean()*1e3:.2f} ms, "
                f"p99 {np.quantile(arr, 0.99)*1e3:.2f} ms, budget "
                f"{self.budget*1e3:.2f} ms, {self.realtime_factor:.1f}x "
                f"real time")


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/rtsdr_trace"):
    """jax profiler trace around a region (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
