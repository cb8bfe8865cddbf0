"""Live view: cli --monitor + viz --live running CONCURRENTLY.

The viewer must render multiple frames from the atomically-replaced
snapshot while the decode is still streaming (the reference's
while-processing fmMonoAnim view, VERDICT r2 #8). The test feeds the
decoder's stdin incrementally and keeps the stream open until the viewer
has rendered its frames — so the decode genuinely outlives the viewer's
startup no matter how warm the compilation cache is (a fixed-length
pre-written input raced: a warm decode could finish before the viewer
imported matplotlib).
"""

import os
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_live_view_attaches_to_running_decode(tmp_path):
    from real_time_sdr_tpu.config import mode_config
    from real_time_sdr_tpu.utils import synth

    cfg = mode_config(0)
    n_gen = 8
    iq, _ = synth.station_iq(cfg, n_gen, ps_name="LIVEVIEW", pi=0xD1D1)
    raw = bytes(iq.tobytes())
    blk = 2 * cfg.block_size_iq
    mon = tmp_path / "mon.npz"
    outdir = tmp_path / "view"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(tmp_path / "out.pcm", "wb") as fout:
        dec = subprocess.Popen(
            [sys.executable, "-m", "real_time_sdr_tpu.cli", "--cpu", "0",
             "r", "--monitor", str(mon), "--monitor-every", "1",
             "--pipeline", "0"],
            stdin=subprocess.PIPE, stdout=fout, stderr=subprocess.DEVNULL,
            env=env)
        view = subprocess.Popen(
            [sys.executable, "-m", "real_time_sdr_tpu.viz", "0",
             "--live", str(mon), "--frames", "2", "--refresh", "0.2",
             "--live-timeout", "420", "--out", str(outdir), "--cpu"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)

        stop = threading.Event()

        def feed():
            b = 0
            while not stop.is_set() and view.poll() is None:
                off = (b % n_gen) * blk
                try:
                    dec.stdin.write(raw[off:off + blk])
                    dec.stdin.flush()
                except BrokenPipeError:
                    return
                b += 1
                time.sleep(0.3)

        th = threading.Thread(target=feed, daemon=True)
        th.start()
        try:
            out, err = view.communicate(timeout=560)
        finally:
            stop.set()
            th.join(timeout=10)
            try:
                dec.stdin.close()
            except Exception:
                pass
            dec.wait(timeout=560)
    assert view.returncode == 0, err.decode()[-2000:]
    assert b"frame 2:" in err, err.decode()[-2000:]
    png = outdir / "live.png"
    assert png.exists() and png.stat().st_size > 1000
