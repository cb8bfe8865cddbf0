"""Runtime-retunable station grids (VERDICT r4 #5).

The fused wideband frontend's weights are jit CONSTANTS on the classic
serving path (fast, but retuning one station means rebuild + recompile +
re-upload). ``FusedWidebandFrontend.device_weights()`` serves them as
DEVICE OPERANDS instead: ``retune(station, offset_hz)`` rebuilds one
station's columns host-side (O(2J*R) numpy) and the next call re-uploads
— the jitted graph is untouched, and every other station's receiver
state carries straight through (the raw-rail history is
station-independent, so even the retuned station restarts from real
signal history). The reference's only retune path is restarting
``rtl_sdr -f`` (model/fmMonoBasic.py:30-42) — full restart, all state
lost.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.models.wideband_frontend import FusedWidebandFrontend
from real_time_sdr_tpu.parallel.channel import ChannelBank
from real_time_sdr_tpu.utils import synth


def _mk(cfg, wide_fs, offs):
    return FusedWidebandFrontend(cfg, wide_fs, offs, compute_dtype="f32")


def dominant_tone(x, fs):
    x = np.asarray(x, np.float64)
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / fs)[sp.argmax()]


def test_operand_weights_match_constants():
    """weights-as-operands must reproduce the constant-weights graph
    exactly (same arrays, same einsum — only the binding differs)."""
    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    offs = [-600_000, 800_000]
    wf = _mk(cfg, wide_fs, offs)
    bank = ChannelBank(rx, n_channels=2)
    rng = np.random.default_rng(7)
    n = cfg.block_size_iq * wf.decim
    iw = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.2)
    qw = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.2)

    bs_c, out_c, ws_c = bank.run_channelized_fused(
        bank.init_state(), wf, iw, qw, wf.init_state())
    bs_o, out_o, ws_o = bank.run_channelized_fused(
        bank.init_state(), wf, iw, qw, wf.init_state(),
        weights=wf.device_weights())
    np.testing.assert_allclose(np.asarray(out_c.left),
                               np.asarray(out_o.left), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(out_c.rds_bits),
                                  np.asarray(out_o.rds_bits))
    np.testing.assert_array_equal(np.asarray(ws_c.pos),
                                  np.asarray(ws_o.pos))


def test_retune_identity_roundtrip():
    """retune to the same offset is a no-op; retune away and back
    restores the original weight matrix bit-for-bit."""
    from real_time_sdr_tpu.config import mode_config
    cfg = mode_config(0)
    wf = _mk(cfg, 4 * cfg.rf_fs, [-600_000, 800_000])
    w0 = wf._w.copy()
    pc0 = wf._pc_np.copy()
    wf.retune(1, 800_000)
    np.testing.assert_array_equal(wf._w, w0)
    wf.retune(1, 1_200_000)
    assert not np.array_equal(wf._w, w0)
    wf.retune(1, 800_000)
    np.testing.assert_array_equal(wf._w, w0)
    np.testing.assert_array_equal(wf._pc_np, pc0)
    # off-raster offsets are rejected with the grid intact
    with pytest.raises(ValueError):
        wf.retune(1, 12_345)
    np.testing.assert_array_equal(wf._w, w0)
    assert wf.offsets == [-600_000, 800_000]


def test_u8_ingest_operand_weights_match():
    """run_wideband_u8_jit with operand weights (the live-serving retune
    form) must match its constant-weights twin; the non-fused path must
    reject weights with a clear error."""
    from real_time_sdr_tpu.models.channelizer import Channelizer

    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    offs = [-600_000, 800_000]
    wf = _mk(cfg, wide_fs, offs)
    bank = ChannelBank(rx, n_channels=2)
    # constant-envelope FM scene, NOT noise: the discriminator's num/den
    # is ill-conditioned on noise (CLAUDE.md), amplifying cross-graph
    # f32 fusion ulps past any honest tolerance
    sky = [dict(offset_hz=-600_000, tone_left=400.0, tone_right=400.0),
           dict(offset_hz=800_000, tone_left=900.0, tone_right=900.0)]
    iw_f, qw_f, _ = synth.wideband_iq(cfg, wide_fs, sky, 2)
    iq = np.empty(2 * len(iw_f))
    iq[0::2], iq[1::2] = iw_f, qw_f
    raw = jnp.asarray(np.clip(np.round(128 + 127 * iq), 0,
                              255).astype(np.uint8))

    bs_c, out_c, ws_c = bank.run_wideband_u8_jit(
        bank.init_state(), wf, raw, wf.init_state())
    bs_o, out_o, ws_o = bank.run_wideband_u8_jit(
        bank.init_state(), wf, raw, wf.init_state(),
        weights=wf.device_weights())
    np.testing.assert_allclose(np.asarray(out_c.mono),
                               np.asarray(out_o.mono), atol=2e-6)

    ch = Channelizer(cfg, wide_fs, offs)
    with pytest.raises(ValueError, match="fused"):
        bank.run_wideband_u8_jit(bank.init_state(), ch, raw,
                                 ch.init_state(),
                                 weights=wf.device_weights())
    iw = jnp.zeros(cfg.block_size_iq * wf.decim, jnp.float32)
    with pytest.raises(ValueError, match="fused"):
        bank.run_wideband_jit(bank.init_state(), ch, iw, iw,
                              ch.init_state(),
                              weights=wf.device_weights())


def test_sharded_retune_propagates():
    """ShardedFusedWideband serves the fold weights as jit ARGUMENTS
    (refreshed via wf._w object identity), so a retune must change its
    output WITHOUT retracing — the round-5 review found the weights were
    baked at __init__ and a retune propagated nowhere."""
    from jax.sharding import Mesh
    from real_time_sdr_tpu.parallel.wideband import ShardedFusedWideband

    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    n_st = 8
    offs = [int((k - (n_st - 1) / 2) * 300_000) for k in range(n_st)]
    wf = _mk(cfg, wide_fs, offs)
    mesh = Mesh(np.array(jax.devices()), ("ch",))
    sw = ShardedFusedWideband(wf, rx, mesh)
    ws, bs = sw.init_state()

    rng = np.random.default_rng(3)
    n = cfg.block_size_iq * wf.decim
    iw = rng.standard_normal(n).astype(np.float32) * 0.2
    qw = rng.standard_normal(n).astype(np.float32) * 0.2

    ws1, bs1, out1 = sw.step(ws, bs, iw, qw)
    a1 = np.asarray(out1.mono)
    wf.retune(3, offs[3] + 600_000)
    ws2, bs2, out2 = sw.step(ws, bs, iw, qw)   # same input, same state
    a2 = np.asarray(out2.mono)
    # retuned station's output changes; every other station's does not
    assert not np.array_equal(a1[3], a2[3])
    for k in range(n_st):
        if k != 3:
            np.testing.assert_array_equal(a1[k], a2[k])
    # and retuning BACK restores the original output bit-for-bit
    wf.retune(3, offs[3])
    _, _, out3 = sw.step(ws, bs, iw, qw)
    np.testing.assert_array_equal(a1, np.asarray(out3.mono))


def test_retune_equals_fresh_construction():
    """Property: after ANY sequence of retunes, the weight matrix and
    rotation tables must equal a frontend built fresh on the final grid,
    bit for bit (pins _station_cols == _init_weights coherence)."""
    from real_time_sdr_tpu.config import mode_config
    cfg = mode_config(0)
    wide_fs = 8 * cfg.rf_fs
    rng = np.random.default_rng(21)
    raster = 100_000
    offs = sorted(int(x) * raster for x in
                  rng.choice(np.arange(-80, 81), size=6, replace=False))
    wf = FusedWidebandFrontend(cfg, wide_fs, offs, compute_dtype="f32")
    for _ in range(5):
        si = int(rng.integers(0, len(offs)))
        new = int(rng.integers(-80, 81)) * raster
        try:
            wf.retune(si, new)
        except ValueError:
            continue   # off-lo raster point for this grid: rejected
    fresh = FusedWidebandFrontend(cfg, wide_fs, wf.offsets,
                                  compute_dtype="f32")
    np.testing.assert_array_equal(wf._w, fresh._w)
    np.testing.assert_array_equal(wf._pc_np, fresh._pc_np)
    np.testing.assert_array_equal(wf._ps_np, fresh._ps_np)


@pytest.mark.slow
def test_retune_station_live_no_recompile():
    """Serve a 3-station sky with a 2-station grid, then retune station 1
    onto the third transmitter mid-stream: no new jit entry, station 0's
    output stays IDENTICAL to a never-retuned run, and station 1 locks
    onto the new transmitter's program audio."""
    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    sky = [
        dict(offset_hz=-600_000, tone_left=400.0, tone_right=400.0),
        dict(offset_hz=800_000, tone_left=900.0, tone_right=900.0),
        dict(offset_hz=1_200_000, tone_left=2500.0, tone_right=2500.0),
    ]
    nb = 8
    iw, qw, _ = synth.wideband_iq(cfg, wide_fs, sky, nb)
    half = len(iw) // 2

    wf = _mk(cfg, wide_fs, [-600_000, 800_000])
    bank = ChannelBank(rx, n_channels=2)
    bs, ws = bank.init_state(), wf.init_state()
    bs, out1, ws = bank.run_wideband_jit(
        bs, wf, jnp.asarray(iw[:half]), jnp.asarray(qw[:half]), ws,
        weights=wf.device_weights())

    wf.retune(1, 1_200_000)
    assert wf.offsets == [-600_000, 1_200_000]
    bs, out2, ws = bank.run_wideband_jit(
        bs, wf, jnp.asarray(iw[half:]), jnp.asarray(qw[half:]), ws,
        weights=wf.device_weights())
    # the retune reused the SAME jitted graph (one cache entry, and that
    # entry was not retraced: jax only retraces on new treedefs/shapes)
    assert len(bank._chan_jit_cache) == 1

    # never-retuned reference for station-0 continuity
    wf_ref = _mk(cfg, wide_fs, [-600_000, 800_000])
    bank_ref = ChannelBank(rx, n_channels=2)
    bs_r, ws_r = bank_ref.init_state(), wf_ref.init_state()
    bs_r, r1, ws_r = bank_ref.run_wideband_jit(
        bs_r, wf_ref, jnp.asarray(iw[:half]), jnp.asarray(qw[:half]),
        ws_r, weights=wf_ref.device_weights())
    bs_r, r2, ws_r = bank_ref.run_wideband_jit(
        bs_r, wf_ref, jnp.asarray(iw[half:]), jnp.asarray(qw[half:]),
        ws_r, weights=wf_ref.device_weights())

    np.testing.assert_array_equal(np.asarray(out2.mono)[0],
                                  np.asarray(r2.mono)[0])

    fs = float(cfg.audio_fs)
    a1 = np.asarray(out1.mono)[1]
    a2 = np.asarray(out2.mono)[1]
    skip = len(a2) // 3
    assert abs(dominant_tone(a1[skip:], fs) - 900.0) < 20
    assert abs(dominant_tone(a2[skip:], fs) - 2500.0) < 20
