"""Benchmark: aggregate real-time multiple on the full FM stereo+RDS chain.

Runs a channel bank of mode-0 receivers (2.4 MS/s IQ each) for B blocks via
the jitted lax.scan runner on the available accelerator, and reports how many
times faster than real time the aggregate decode runs. The reference's
implicit contract is 1.0x on a host CPU (SURVEY.md section 6); the printed
``vs_baseline`` is therefore the same multiple.

Prints exactly one JSON line:
  {"metric": "aggregate_realtime_x", "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=48)
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--pll-tier", type=int, default=3,
                    help="1 exact scan, 2 Newton, 3 feedforward (fastest)")
    ap.add_argument("--no-rds", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--block-scan", action="store_true",
                    help="per-block lax.scan instead of segment mode")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.parallel.channel import ChannelBank
    from real_time_sdr_tpu.utils import synth

    rx = Receiver(args.mode, stereo=True, rds=not args.no_rds,
                  pll_tier=args.pll_tier)
    cfg = rx.cfg
    bank = ChannelBank(rx, args.channels)

    iq, _ = synth.station_iq(cfg, args.blocks)
    # distinct data per channel (same station, channel-dependent time shift)
    per_ch = np.stack([np.roll(iq, 2 * 997 * c) for c in range(args.channels)])
    if args.block_scan:
        blocks = jnp.asarray(np.ascontiguousarray(
            per_ch.reshape(args.channels, args.blocks, -1).transpose(1, 0, 2)))
        run = bank.run
    else:
        blocks = jnp.asarray(per_ch)  # (C, B*2N): one segment per channel
        run = bank.run_segment

    state = bank.init_state()

    def sync(x):
        # On the tunneled `axon` platform block_until_ready does not actually
        # wait for execution; a (tiny) host fetch of the result does.
        return np.asarray(x[..., -1, -8:])

    # compile + warm
    s2, out = run(state, blocks)
    sync(out.left)

    # tunnel round-trip floor (dispatch nothing, fetch something tiny)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(out.left)
    rt_floor = (time.perf_counter() - t0) / 3

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        s2, out = run(state, blocks)
        sync(out.left)
        best = min(best, time.perf_counter() - t0)
    best = max(best - rt_floor, 1e-9)

    iq_samples = args.channels * args.blocks * cfg.block_size_iq
    ms_per_s = iq_samples / best / 1e6
    realtime_x = ms_per_s / (cfg.rf_fs / 1e6)
    result = {
        "metric": "aggregate_realtime_x",
        "value": round(realtime_x, 2),
        "unit": f"x_realtime_{cfg.rf_fs/1e6:g}MSps_fm_stereo"
                + ("" if args.no_rds else "_rds"),
        "vs_baseline": round(realtime_x, 2),
    }
    print(json.dumps(result))
    print(f"# {ms_per_s:.1f} MS/s aggregate over {args.channels} ch x "
          f"{args.blocks} blocks, best of {args.repeats}: {best*1e3:.1f} ms "
          f"on {jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
