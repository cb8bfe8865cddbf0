"""Top device kernels by time for one receiver config (trace-driven
kernel hunt, the round-3 workflow generalized): jit the staged 32ch x 12blk
digest step, profile a few reps through the tunnel, and rank XLA/Mosaic
ops by total device time from the trace.json.gz.

Usage: python experiments/trace_top.py [--mode 1] [--top 20] [--reps 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", type=int, default=1)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/rtsdr_trace_top")
    args = ap.parse_args()

    import jax
    import numpy as np

    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.utils import benchkit, synth

    rx = Receiver(args.mode, stereo=True, rds=True, pll_tier=3)
    cfg = rx.cfg
    n_ch, n_blk = args.channels, args.blocks
    n_len = n_blk * 2 * cfg.block_size_iq
    iq, _ = synth.station_iq(cfg, n_blk)
    st = rx.init_state(batch=(n_ch,))
    if hasattr(rx.frontend.rf_fir, "stage_segment"):
        rows = benchkit.shifted_channel_segments_host(iq, n_ch, n_len)
        cell = benchkit.stage_cells(rx, rows, 1, n_ch, 1, n_len)[0][0]
        step = benchkit.digest_step_staged(rx, n_len)
    else:
        cell = benchkit.shifted_channel_segments(iq, n_ch, n_len)
        step = benchkit.digest_step(rx)

    s2, dig = step(st, cell)
    float(np.asarray(dig).ravel()[0])  # compile + warm

    import shutil
    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    s = st
    for _ in range(args.reps):
        s, dig = step(s, cell)
    float(np.asarray(dig).ravel()[0])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(args.trace_dir,
                                   "**/*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {args.trace_dir}"
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        tr = json.load(f)
    # device-lane complete events only (TPU ops have their xla op name in
    # the event name; host threads are filtered by requiring args.run_id
    # or a device-ish pid name)
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
    print(f"# mode {args.mode} {n_ch}x{n_blk}, {args.reps} reps; device "
          f"total {grand/1e3:.2f} ms ({grand/1e3/args.reps:.3f} ms/run)")
    for name, tot in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{tot/args.reps:9.1f} us/run  x{counts[name]//args.reps:<4d}"
              f" {name[:110]}")


if __name__ == "__main__":
    main()
