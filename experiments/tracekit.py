"""Shared trace-profiling helpers for the experiments/ kernel hunts.

`profile_reps` wraps N reps of a step callable in jax.profiler and
returns the trace path; `rank_kernels` parses the trace.json.gz and
prints the top device kernels by total time (the round-3 tunnel-parsing
workflow, factored out of trace_top.py so wideband/sharded variants
reuse it).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil


def profile_reps(trace_dir: str, run) -> None:
    """Profile `run()` (which should execute the warm reps and block)."""
    import jax

    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()


def rank_kernels(trace_dir: str, reps: int, top: int = 20,
                 header: str = "") -> float:
    """Parse the newest trace under trace_dir; print top kernels.

    Returns total device ms/run."""
    paths = glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        tr = json.load(f)
    pids = {p["pid"]: p.get("args", {}).get("name", "")
            for p in tr["traceEvents"] if p.get("ph") == "M"
            and p.get("name") == "process_name"}
    dev_pids = {pid for pid, name in pids.items()
                if "TPU" in name or "/device:" in name or "XLA" in name}
    totals: dict[str, float] = {}
    counts: dict[str, int] = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        totals[name] = totals.get(name, 0.0) + ev.get("dur", 0.0)
        counts[name] = counts.get(name, 0) + 1
    grand = sum(totals.values())
    print(f"# {header}{reps} reps; device total {grand/1e3:.2f} ms "
          f"({grand/1e3/reps:.3f} ms/run)")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{tot/reps:9.1f} us/run  x{counts[name]//reps:<4d}"
              f" {name[:110]}")
    return grand / 1e3 / reps
