"""Top device kernels by time for one receiver config (trace-driven
kernel hunt, the round-3 workflow generalized): jit the staged 32ch x 12blk
digest step, profile a few reps through the tunnel, and rank XLA/Mosaic
ops by total device time from the trace.json.gz.

Usage: python experiments/trace_top.py [--mode 1] [--top 20] [--reps 8]
"""

from __future__ import annotations

import argparse
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

    from experiments.tracekit import profile_reps, rank_kernels

    s2, dig = step(st, cell)
    float(np.asarray(dig).ravel()[0])  # compile + warm

    def run():
        s, dig = st, None
        for _ in range(args.reps):
            s, dig = step(s, cell)
        float(np.asarray(dig).ravel()[0])

    profile_reps(args.trace_dir, run)
    rank_kernels(args.trace_dir, args.reps, args.top,
                 header=f"mode {args.mode} {n_ch}x{n_blk}: ")


if __name__ == "__main__":
    main()
