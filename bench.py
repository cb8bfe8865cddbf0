"""Benchmark: aggregate real-time multiple on the full FM stereo+RDS chain.

Runs a channel bank of mode-0 receivers (2.4 MS/s IQ each) through the fused
segment-mode graph and reports how many times faster than real time the
aggregate decode runs. The reference's implicit contract is 1.0x on a host
CPU (SURVEY.md section 6); the printed ``vs_baseline`` is the same multiple.

Prints exactly ONE JSON line:
  {"metric": "aggregate_realtime_x", "value": N, "unit": ..., "vs_baseline": N}

Survival design (the driver runs this cold with a finite timeout, and the
axon-tunneled TPU backend never persists compiled executables, so EVERY
driver run pays full remote compiles):

- a LADDER of configs, smallest first: the first rung compiles + measures in
  ~2 minutes, so a valid number exists early; later rungs scale up to the
  flagship 128ch x 48blk segment and simply replace the result if they finish;
- a wall-clock budget (--budget / BENCH_BUDGET_S) checked between rungs,
  with the next rung attempted only if the remaining budget plausibly covers
  a fresh compile;
- SIGTERM/SIGINT handlers + atexit: if the driver's timeout kills us, the
  best completed measurement is still printed (exactly once);
- timing by CHAINING state through R dependent executions and fetching one
  tiny on-device digest at the end — `block_until_ready` does not sync on
  the axon platform and a lone run is shorter than the ~50 ms tunnel round
  trip, so per-call timing is meaningless. The digest (a jnp.sum over every
  output) also defeats XLA dead-code elimination without materializing
  R x ~0.7 GB of audio on the device.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

_result: dict | None = None
_printed = False


def _emit(*_args) -> None:
    """Print the best result exactly once (normal exit or signal)."""
    global _printed
    if _result is not None and not _printed:
        _printed = True
        print(json.dumps(_result), flush=True)
    if _args:
        # signal path: NEVER swallow SIGTERM/SIGINT (a handler that
        # returns would keep the process alive past the driver's timeout)
        os._exit(0 if _result is not None else 143)


def _better(new: dict | None, old: dict | None) -> dict | None:
    if old is None:
        return new
    if new is None:
        return old
    return new if new["value"] >= old["value"] else old


def _start_cpu_insurance() -> subprocess.Popen | None:
    """Launch a tiny CPU-backend run in a subprocess: a guaranteed non-null
    number even if the TPU tunnel is down or remote compiles outlast the
    driver's timeout. Overwritten by any completed TPU rung."""
    cmd = [sys.executable, os.path.abspath(__file__), "--cpu", "--channels",
           "4", "--blocks", "4", "--no-insurance", "--budget", "150"]
    try:
        return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                cwd=os.path.dirname(os.path.abspath(__file__)))
    except Exception as e:  # noqa: BLE001 - insurance must never raise
        print(f"# cpu insurance failed to start: {e!r}", file=sys.stderr)
        return None


def _collect_cpu_insurance(proc: subprocess.Popen | None,
                           timeout_s: float | None) -> dict | None:
    """Harvest the insurance subprocess. timeout_s=None -> non-blocking:
    only parse if the child already exited (leave it running otherwise)."""
    if proc is None:
        return None
    try:
        if timeout_s is None:
            if proc.poll() is None:
                return None
            out, _ = proc.communicate(timeout=1.0)
        else:
            out, _ = proc.communicate(timeout=max(5.0, timeout_s))
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as e:  # noqa: BLE001
        proc.kill()
        print(f"# cpu insurance failed: {e!r}", file=sys.stderr)
    return None


def _tpu_probe(timeout_s: float) -> bool:
    """Run a trivial device op in a SUBPROCESS with a hard timeout.

    The axon tunnel, when unhealthy, wedges backend init indefinitely with
    no error; probing in a child process keeps this process from hanging at
    its first device touch and lets us wait out a transient outage. The
    probe also rejects a CPU fallback backend (a fast-FAILING plugin would
    otherwise pass the probe and burn the budget running rungs on CPU
    under a TPU-implying label)."""
    code = ("import jax, numpy as np, jax.numpy as jnp;"
            "v = float(np.asarray(jnp.arange(8.0)[3] * 2));"
            "print('PROBE', v, jax.default_backend())")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=max(10.0, timeout_s))
        if out.returncode != 0:
            return False
        fields = out.stdout.strip().split()
        return (len(fields) >= 3 and fields[0] == "PROBE"
                and fields[1] == "6.0" and fields[2] != "cpu")
    except Exception:  # noqa: BLE001 - timeout or spawn failure
        return False


def main() -> None:
    global _result
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=None,
                    help="fix the channel count (disables the ladder)")
    ap.add_argument("--blocks", type=int, default=None,
                    help="fix the block count (disables the ladder)")
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--pll-tier", type=int, default=3,
                    help="1 exact scan, 2 Newton, 3 feedforward (fastest)")
    ap.add_argument("--no-rds", action="store_true")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "460")),
                    help="total wall-clock budget in seconds")
    ap.add_argument("--min-measure", type=float, default=1.5,
                    help="minimum measured span per rung (seconds)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--no-insurance", action="store_true",
                    help="skip the small CPU-subprocess fallback run")
    ap.add_argument("--stats", action="store_true",
                    help="print per-stage speed-of-light accounting to stderr")
    ap.add_argument("--group", type=int, default=32,
                    help="serve wide channel batches as sequential groups of "
                         "this width (the v5e cache-locality optimum; "
                         "0 = one wide batch)")
    ap.add_argument("--tile", type=int, default=12,
                    help="serve long rungs as host-chained segment calls of "
                         "this many blocks (the v5e optimum; dispatches "
                         "pipeline asynchronously so chunking costs nothing; "
                         "0 = one wide in-graph pass)")
    ap.add_argument("--wideband", type=int, default=8, metavar="N",
                    help="also measure the channelizer serving path: N "
                         "stations mixed+decimated out of ONE 4x-rate "
                         "wideband capture, then decoded as a bank "
                         "(models/channelizer.py); prints a stderr line "
                         "so the driver's BENCH_r*.json tail records it "
                         "(0 disables; runs only if budget remains after "
                         "the flagship ladder)")
    ap.add_argument("--staged", choices=("auto", "0", "1"), default="auto",
                    help="serve HOST-staged segments (tail+pad built by the "
                         "ingest, zero device staging copies; pallas "
                         "frontend only). auto = on when the frontend is "
                         "pallas")
    ap.add_argument("--latency", action="store_true",
                    help="also measure BLOCK-mode per-step latency vs the "
                         "real-time deadline (the reference's contract is "
                         "one block per block-duration, src/Makefile:4-5)")
    args = ap.parse_args()

    t_start = time.perf_counter()
    remaining = lambda: args.budget - (time.perf_counter() - t_start)

    signal.signal(signal.SIGTERM, _emit)
    signal.signal(signal.SIGINT, _emit)
    import atexit
    atexit.register(_emit)

    # Guaranteed fallback number (runs concurrently with the tunnel probe).
    ins_proc = None
    if not args.no_insurance and not args.cpu:
        ins_proc = _start_cpu_insurance()

    # Never touch the device backend in THIS process until a subprocess
    # probe proves the tunnel answers — a wedged tunnel would otherwise
    # hang us at the first jit with nothing emitted but the insurance.
    tunnel_ok = args.cpu
    while not tunnel_ok:
        tunnel_ok = _tpu_probe(min(90.0, remaining() - 30.0))
        # harvest the insurance number the moment it's ready, so a driver
        # SIGTERM mid-probe-loop still emits a valid JSON line
        _result = _better(_collect_cpu_insurance(ins_proc, None), _result)
        if tunnel_ok or remaining() < 150.0:
            break
        print(f"# device tunnel unresponsive; retrying probe "
              f"({remaining():.0f}s budget left)", file=sys.stderr)
        time.sleep(min(20.0, max(0.0, remaining() - 140.0)))

    if not tunnel_ok:
        # last chance for the fallback number: block on the child
        _result = _better(
            _collect_cpu_insurance(ins_proc, min(150.0, remaining() * 0.6)),
            _result)
        if _result is not None:
            # label the record so a CPU fallback is never mistaken for the
            # TPU number (the device's measured figure lives in BENCH_NOTES)
            _result["device"] = (_result.get("device", "cpu")
                                 + " FALLBACK: tpu tunnel down")
        print("# device tunnel down for the whole budget; reporting the "
              "CPU fallback number", file=sys.stderr)
        return  # atexit emits the best result

    import jax
    if args.cpu:
        # NB: the JAX_PLATFORMS env var is overridden by the axon plugin;
        # only this config call reliably forces CPU (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.parallel.channel import ChannelBank
    from real_time_sdr_tpu.utils import synth

    rx = Receiver(args.mode, stereo=True, rds=not args.no_rds,
                  pll_tier=args.pll_tier)
    cfg = rx.cfg
    unit = (f"x_realtime_{cfg.rf_fs/1e6:g}MSps_fm_stereo"
            + ("" if args.no_rds else "_rds"))

    if args.channels is not None or args.blocks is not None:
        rungs = [(args.channels or 128, args.blocks or 48)]
    else:
        # smallest first: rung 0 exists to guarantee a number; (32, 12) is
        # the measured throughput-optimal shape (BENCH_NOTES.md sweep).
        # (128, 12) compiles the grouped serving graph which (128, 48)
        # then reuses via host chunking — the flagship rung pays no
        # additional compile.
        rungs = [(16, 12), (32, 12), (128, 12), (128, 48)]

    # One synth segment covering the largest rung; channels get distinct
    # time shifts of it.
    max_blocks = max(b for _, b in rungs)
    iq, _ = synth.station_iq(cfg, max_blocks)

    from real_time_sdr_tpu.utils import benchkit

    # ONE jitted graph serves every rung cell: wide channel banks split
    # into --group-wide sub-banks and long captures into --tile-block
    # chunks ON THE HOST, with each (group, chunk) cell a separate async
    # dispatch of this same executable. Dispatches pipeline on device, so
    # chunking costs nothing; the graph stays at the throughput-optimal
    # (32 ch x 12 blk) shape; and the flagship rung pays ZERO extra
    # compile over the optimum rung. (In-graph alternatives measured
    # WORSE on v5e: lax.map grouping 1976x, map+scan tiling 944x, vs
    # 2916x host-celled at 128ch x 48blk — and their compiles run
    # 3-6 minutes cache-cold vs seconds here.)
    digest_plain = benchkit.digest_step(rx)
    staged = (args.staged == "1" or (args.staged == "auto"
                                     and rx.frontend.impl == "pallas"))
    if staged and not hasattr(rx.frontend.rf_fir, "stage_segment"):
        print("# --staged needs the pallas frontend; serving unstaged",
              file=sys.stderr)
        staged = False
    if staged:
        print("# serving host-staged segments (--staged)", file=sys.stderr)
    # staged digests are per-chunk-length; every ladder rung tiles to the
    # same 12-block chunk, so this stays ONE graph in practice
    staged_digests: dict[int, object] = {}

    def fetch(x):
        return float(np.asarray(x)[()] if np.ndim(x) == 0 else
                     np.asarray(x).ravel()[0])

    last_rung_cost = 0.0
    for n_ch, n_blk in rungs:
        # Heuristic gate: a fresh rung needs compile (~ last rung's cost or
        # more) plus measurement time; stop rather than time out mid-compile.
        need = max(90.0, 1.4 * last_rung_cost)
        if _result is not None and remaining() < need:
            print(f"# skipping rung {n_ch}x{n_blk}: {remaining():.0f}s left "
                  f"< {need:.0f}s needed", file=sys.stderr)
            break
        t_rung = time.perf_counter()
        try:
            n_len = n_blk * 2 * cfg.block_size_iq
            if args.tile and n_blk > args.tile and n_blk % args.tile == 0:
                n_chunks = n_blk // args.tile
            else:
                n_chunks = 1
            g = args.group
            if not g or n_ch <= g or n_ch % g:
                g = n_ch
            n_g = n_ch // g
            chunk_len = n_len // n_chunks
            if staged:
                # host-staged cells: tail+pad baked in (steady-state
                # cyclic tails), digest via run_segment_staged. The
                # shifted bank is built HOST-side — staging happens on
                # the host anyway, and the device build would round-trip
                # the whole capture through the tunnel twice.
                per_ch_host = benchkit.shifted_channel_segments_host(
                    iq, n_ch, n_len)
                cells = benchkit.stage_cells(rx, per_ch_host, n_g, g,
                                             n_chunks, chunk_len)
                if chunk_len not in staged_digests:
                    staged_digests[chunk_len] = \
                        benchkit.digest_step_staged(rx, chunk_len)
                digest_v = staged_digests[chunk_len]
            else:
                per_ch_dev = benchkit.shifted_channel_segments(iq, n_ch,
                                                               n_len)
                digest_v = digest_plain
                # cells[gi][k]: (g, chunk_len) uint8 for sub-bank gi, chunk k
                cells = [[jax.device_put(
                    per_ch_dev[gi * g:(gi + 1) * g,
                               k * chunk_len:(k + 1) * chunk_len])
                    for k in range(n_chunks)] for gi in range(n_g)]
            states = [rx.init_state(batch=(g,)) for _ in range(n_g)]
            # compile + warm up (the digest fetch is the only real sync on
            # the axon platform)
            state2, dig = digest_v(states[0], cells[0][0])
            fetch(dig)
            t_compile = time.perf_counter() - t_rung

            # measure: chain each sub-bank's state through its chunks,
            # reps times; one digest fetch syncs the whole pipeline
            reps = 1
            per_run = None
            while remaining() > 5.0:
                t0 = time.perf_counter()
                ss = list(states)
                for _ in range(reps):
                    for k in range(n_chunks):
                        for gi in range(n_g):
                            ss[gi], dig = digest_v(ss[gi], cells[gi][k])
                fetch(dig)
                dt = time.perf_counter() - t0
                per_run = dt / reps
                if dt >= args.min_measure or reps >= 4096:
                    break
                reps = min(4096, max(reps * 2, int(
                    reps * 1.3 * args.min_measure / max(dt, 1e-3))))
            if per_run is None:
                break
            iq_samples = n_ch * n_blk * cfg.block_size_iq
            ms_per_s = iq_samples / per_run / 1e6
            realtime_x = ms_per_s / (cfg.rf_fs / 1e6)
            _result = _better({
                "metric": "aggregate_realtime_x",
                "value": round(realtime_x, 2),
                "unit": unit,
                "vs_baseline": round(realtime_x, 2),
                "device": jax.devices()[0].device_kind,
            }, _result)
            last_rung_cost = time.perf_counter() - t_rung
            print(f"# rung {n_ch}ch x {n_blk}blk: {realtime_x:.0f}x realtime "
                  f"({ms_per_s:.1f} MS/s, {per_run*1e3:.1f} ms/run x {reps} "
                  f"reps, setup+compile {t_compile:.0f}s) on "
                  f"{jax.devices()[0].device_kind}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - keep earlier rung's number
            print(f"# rung {n_ch}x{n_blk} failed: {e!r}", file=sys.stderr)
            break

    if args.wideband and _result is not None and remaining() > 60:
        # Channelizer serving path: one wideband stream in, N stations out.
        try:
            from real_time_sdr_tpu.models.wideband_frontend import (
                FusedWidebandFrontend, make_wideband_frontend)
            wide_fs = 4 * cfg.rf_fs
            n_st = args.wideband
            span = wide_fs // 2 - cfg.rf_fs // 2
            # snap to the 100 kHz FM channel raster (real tuners do):
            # keeps the periodic-exact tones AND the static-tone fold
            offs = [int(round((-span + (2 * span) * k / max(n_st - 1, 1))
                              / 100e3) * 100e3) for k in range(n_st)]
            ch = make_wideband_frontend(cfg, wide_fs, offs)
            wb_fused = isinstance(ch, FusedWidebandFrontend)
            from real_time_sdr_tpu.parallel.channel import ChannelBank
            bank = ChannelBank(rx, n_st)
            # segment serving (same shape rule as the station bank): one
            # device call channelizes + decodes wb_seg blocks. Per-scale
            # optimum measured 2026-08-20: the fused frontend runs so much
            # faster that the working-set knee moves — 8 stations peak at
            # seg 24 (~400x), 64 stations at seg 8 (~72x); the u8 path
            # keeps its historic seg-12 shape
            wb_seg = 24 if wb_fused else 12
            n_wb = 2  # wideband segments cycled through the chain
            block_pairs = cfg.block_size_iq * ch.decim
            rng = np.random.default_rng(0)
            # SEPARATE device arrays per cycled segment: indexing one
            # (n_wb, N) array per rep dispatches an extra full-segment
            # slice copy each call (measured 3.7 ms/run at 8 stations —
            # 3x the whole fused compute)
            iw = [jnp.asarray(rng.standard_normal(
                (wb_seg * block_pairs,)).astype(np.float32) * 0.1)
                for _ in range(n_wb)]
            qw = [jnp.asarray(rng.standard_normal(
                (wb_seg * block_pairs,)).astype(np.float32) * 0.1)
                for _ in range(n_wb)]

            def wb_step(cstate, bstate, i, q):
                if wb_fused:
                    bstate, out, cstate = bank.run_channelized_fused(
                        bstate, ch, i, q, cstate, group=16)
                else:
                    bstate, out, cstate = bank.run_channelized(
                        bstate, ch, i, q, cstate)
                sums = [jnp.sum(o if o.dtype != jnp.int32
                                else o.astype(jnp.float32))
                        for o in jax.tree_util.tree_leaves(out)]
                return cstate, bstate, sum(sums)

            wb_jit = jax.jit(wb_step)
            cs, bs = ch.init_state(), rx.init_state(batch=(n_st,))
            cs2, bs2, dig = wb_jit(cs, bs, iw[0], qw[0])
            fetch(dig)
            # adaptive reps: a fused run is ~1-4 ms, far under the ~50 ms
            # tunnel fetch floor — grow until the span dominates the RPC.
            # per_block is set INSIDE the loop (before reps updates) so a
            # budget-bounded exit still reports span/reps consistently
            reps, per_block = 16, None
            while remaining() > 10.0:
                t0 = time.perf_counter()
                c, b = cs, bs
                for r in range(reps):
                    c, b, dig = wb_jit(c, b, iw[r % n_wb], qw[r % n_wb])
                fetch(dig)
                span = time.perf_counter() - t0
                per_block = span / reps / wb_seg
                if span >= 1.0 or reps >= 4096:
                    break
                reps = min(4096, max(reps * 2,
                                     int(reps * 1.3 / max(span, 1e-3))))
            if per_block is None:
                raise RuntimeError("no budget left for the wideband rung")
            wb_ms = block_pairs / per_block / 1e6
            rt = wb_ms / (wide_fs / 1e6)
            print(f"# wideband channelize+decode ({n_st} stations from one "
                  f"{wide_fs/1e6:g} MS/s capture, {wb_seg}-block segments, "
                  f"{'fused' if wb_fused else 'u8'} frontend): "
                  f"{per_block*1e3:.2f} ms/block, {wb_ms:.0f} MS/s wideband "
                  f"= {rt:.0f}x realtime", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# wideband measurement failed: {e!r}", file=sys.stderr)

    if args.latency and _result is not None and remaining() > 60:
        # Real-time serving latency: single-block steps (the streaming-mode
        # graph), chained through carried state. Per-block latency must stay
        # under the block deadline (block_size_iq / rf_fs, 30.625 ms at
        # mode 0) for live `rtl_sdr | ... | aplay` operation.
        try:
            n_lat = min(c for c, _ in rungs)
            blk = 2 * cfg.block_size_iq
            blocks = jnp.asarray(np.stack(
                [np.roll(iq[:blk], 2 * 997 * c) for c in range(n_lat)]))
            step_v = jax.jit(jax.vmap(rx.step))
            st = rx.init_state(batch=(n_lat,))
            st2, out = step_v(st, blocks)
            fetch(jax.tree_util.tree_leaves(out)[0])
            reps = 64
            t0 = time.perf_counter()
            s = st
            for _ in range(reps):
                s, out = step_v(s, blocks)
            fetch(jax.tree_util.tree_leaves(out)[0])
            per_block = (time.perf_counter() - t0) / reps
            deadline = cfg.block_size_iq / cfg.rf_fs
            # NB: this is the SUSTAINED step time under pipelined dispatch
            # (what determines whether a live stream keeps up with the
            # deadline), not the one-block wall latency — through the axon
            # tunnel a synchronized single step also pays the ~40-60 ms
            # RPC round trip, which a locally-attached TPU would not.
            print(f"# block-mode sustained step ({n_lat} ch): "
                  f"{per_block*1e3:.2f} ms/block vs {deadline*1e3:.2f} ms "
                  f"real-time deadline ({deadline/per_block:.0f}x headroom, "
                  f"pipelined)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# latency measurement failed: {e!r}", file=sys.stderr)

    if args.stats and _result is not None:
        from real_time_sdr_tpu.utils.logging import speed_of_light_report
        # amortize over the DISPATCH CELL (host-cell group x tile), not
        # the rung totals: wide/long rungs serve as chained g x tile
        # cells, so weights stream once per cell, not once per rung
        cell_ch, cell_blk = g, n_blk // n_chunks
        speed_of_light_report(rx, file=sys.stderr,
                              channels=cell_ch, blocks=cell_blk)
        # per-mode ceilings from the same cost() plumbing (static math, no
        # compiles) — so a low non-flagship x-realtime number can be judged
        # against ITS OWN floor (modes 1/3 carry less signal per block;
        # measured matrix: experiments/mode_floors.py + BENCH_NOTES)
        print(f"# per-mode speed-of-light ceilings (stereo"
              f"{'' if args.no_rds else '+RDS'}, tier {args.pll_tier}):",
              file=sys.stderr)
        with open(os.devnull, "w") as devnull:
            for m in (0, 1, 2, 3):
                rxm = rx if m == args.mode else Receiver(
                    m, stereo=True, rds=not args.no_rds,
                    pll_tier=args.pll_tier)
                sol = speed_of_light_report(rxm, file=devnull,
                                            channels=cell_ch,
                                            blocks=cell_blk)
                print(f"#   mode {m}: floor {sol['floor_s']*1e6:6.2f} "
                      f"us/block -> ceiling {sol['ceiling_x']:,.0f}x "
                      f"realtime/channel", file=sys.stderr)

    # harvest (or retire) the still-running insurance child before emitting
    if ins_proc is not None and ins_proc.poll() is None and _result is None:
        _result = _better(
            _collect_cpu_insurance(ins_proc, max(5.0, remaining())), _result)
    else:
        _result = _better(_collect_cpu_insurance(ins_proc, None), _result)
    if ins_proc is not None and ins_proc.poll() is None:
        ins_proc.kill()

    _emit()


if __name__ == "__main__":
    main()
