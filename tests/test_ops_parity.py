"""On-device op parity vs the golden float64 oracle.

Mirrors the reference's model-as-oracle strategy (SURVEY.md section 4):
per-block tensor comparison within float32 SNR bounds across carried-state
block boundaries.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from golden import dsp
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.ops.fir import PolyFIR, init_state, state_len
from real_time_sdr_tpu.ops.demod import fm_demod
from real_time_sdr_tpu.ops.pll import PllParams, pll_init, pll_scan, pll_newton


def snr_db(ref, got):
    ref = np.asarray(ref, dtype=np.float64)
    got = np.asarray(got, dtype=np.float64)
    err = ref - got
    p = np.mean(ref**2)
    e = np.mean(err**2)
    if e == 0:
        return np.inf
    return 10 * np.log10(p / e)


@pytest.mark.parametrize("up,down,taps", [
    (1, 1, 101),       # plain causal FIR
    (1, 10, 101),      # RF front-end decimator
    (1, 5, 101),       # mode-0 audio decimator
    (247, 640, 101 * 247),   # RDS rational resampler
    (147, 800, 101 * 147),   # mode-2 audio resampler
])
def test_polyfir_matches_golden_across_blocks(up, down, taps):
    rng = np.random.default_rng(42)
    h = rng.standard_normal(taps) / np.sqrt(taps)
    n = 7350 if up == 1 else 7350  # IF-rate block
    blocks = [rng.standard_normal(n).astype(np.float32) for _ in range(3)]

    f = PolyFIR(h, up=up, down=down)
    tail = init_state(taps, up)
    gstate = np.zeros(state_len(taps, up))
    for b in blocks:
        y, tail = f(jnp.asarray(b), tail)
        gy, gstate = dsp.fir_resample_block(b, h, gstate, up, down)
        assert y.shape[0] == len(gy) == (n * up) // down
        assert snr_db(gy, np.asarray(y)) > 110  # float32 round-off only


def test_polyfir_decim_equals_golden_fir_block():
    # the decimating path must equal the plain stateful FIR oracle
    rng = np.random.default_rng(0)
    h = filters.design_lpf(2.4e6, 100e3, 101)
    f = PolyFIR(h, up=1, down=10)
    tail = init_state(101)
    gstate = np.zeros(100)
    for _ in range(2):
        x = rng.standard_normal(73500).astype(np.float32)
        y, tail = f(jnp.asarray(x), tail)
        gy, gstate = dsp.fir_block(x, h, gstate, 10)
        assert snr_db(gy, np.asarray(y)) > 110


def test_polyfir_batched_channels():
    rng = np.random.default_rng(1)
    h = filters.design_lpf(240e3, 16e3, 101)
    f = PolyFIR(h, up=1, down=5)
    x = rng.standard_normal((4, 7350)).astype(np.float32)
    tail = jnp.zeros((4, 100), jnp.float32)
    y, new_tail = f(jnp.asarray(x), tail)
    assert y.shape == (4, 1470)
    for c in range(4):
        gy, _ = dsp.fir_block(x[c], h, np.zeros(100), 5)
        assert snr_db(gy, np.asarray(y[c])) > 110
    np.testing.assert_allclose(np.asarray(new_tail), x[:, -100:])


def test_fm_demod_matches_golden():
    rng = np.random.default_rng(7)
    t = np.arange(7350) / 240e3
    # synthesize a frequency-modulated complex tone
    msg = np.sin(2 * np.pi * 1000 * t)
    phase = np.cumsum(msg) * 2 * np.pi * 50e3 / 240e3
    i_all = np.cos(phase).astype(np.float32)
    q_all = np.sin(phase).astype(np.float32)

    pi_, pq_ = 0.0, 0.0
    ji, jq = jnp.zeros(()), jnp.zeros(())
    for s in range(0, 7350, 735):
        i_b, q_b = i_all[s:s + 735], q_all[s:s + 735]
        g, pi_, pq_ = dsp.fm_demod_block(i_b, q_b, pi_, pq_)
        y, ji, jq = fm_demod(jnp.asarray(i_b), jnp.asarray(q_b), ji, jq)
        assert snr_db(g, np.asarray(y)) > 80


def test_fm_demod_arctan_matches_golden():
    from real_time_sdr_tpu.ops.demod import fm_demod_arctan

    t = np.arange(7350) / 240e3
    msg = np.sin(2 * np.pi * 1000 * t)
    phase = np.cumsum(msg) * 2 * np.pi * 50e3 / 240e3
    i_all = np.cos(phase).astype(np.float32)
    q_all = np.sin(phase).astype(np.float32)

    gp = 0.0
    jp = jnp.zeros(())
    for s in range(0, 7350, 735):
        i_b, q_b = i_all[s:s + 735], q_all[s:s + 735]
        g, gp = dsp.fm_demod_arctan_block(i_b, q_b, gp)
        y, jp = fm_demod_arctan(jnp.asarray(i_b), jnp.asarray(q_b), jp)
        assert snr_db(g, np.asarray(y)) > 80
    # arctan and arctan-free demods agree at small per-sample phase steps
    # (the arctan-free form is the sin(d_theta) ~= d_theta approximation, so
    # they diverge by design at large deviation)
    phase_lo = np.cumsum(msg) * 2 * np.pi * 5e3 / 240e3
    i_lo, q_lo = np.cos(phase_lo), np.sin(phase_lo)
    g_free, _, _ = dsp.fm_demod_block(i_lo, q_lo, 1.0, 0.0)
    g_atan, _ = dsp.fm_demod_arctan_block(i_lo, q_lo, 0.0)
    assert snr_db(g_atan[10:], g_free[10:]) > 45


def test_fm_demod_zero_guard():
    i = jnp.asarray(np.array([0.0, 1.0, 0.0], np.float32))
    q = jnp.asarray(np.array([0.0, 0.0, 0.0], np.float32))
    y, _, _ = fm_demod(i, q, jnp.zeros(()), jnp.zeros(()))
    assert np.asarray(y)[0] == 0.0
    assert np.isfinite(np.asarray(y)).all()


def _pilot_signal(n, fs=240_000, f=19_000.0, phase0=0.3, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * f * t + phase0)
    if noise:
        x = x + noise * rng.standard_normal(n)
    return x.astype(np.float32)


def test_pll_scan_matches_golden_blocks():
    fs, f = 240_000, 19_000
    x = _pilot_signal(4 * 7350, fs, f + 40.0, noise=0.05)  # slight offset
    p = PllParams(freq=f, fs=fs, nco_scale=2.0, norm_bw=0.01)
    carry = pll_init()
    gstate = dsp.PllState()
    outs, gouts = [], []
    for s in range(0, len(x), 7350):
        blk = x[s:s + 7350]
        car, carry = pll_scan(jnp.asarray(blk), carry, p)
        gcar, gstate = dsp.pll_block(blk, f, fs, gstate, nco_scale=2.0,
                                     norm_bw=0.01)
        outs.append(np.asarray(car))
        gouts.append(gcar[:len(blk)])
    got = np.concatenate(outs)
    ref = np.concatenate(gouts)
    # float32 trig + reduction-order differences accumulate; demand high
    # agreement over the full 4-block run
    assert snr_db(ref, got) > 35
    # and near-perfect correlation of the carrier (phase agreement)
    c = np.corrcoef(ref, got)[0, 1]
    assert c > 0.999


def test_pll_newton_matches_scan_when_locked():
    fs, f = 240_000, 19_000
    p = PllParams(freq=f, fs=fs, nco_scale=2.0, norm_bw=0.01)
    x = _pilot_signal(6 * 7350, fs, f + 25.0, noise=0.02)
    # warm both with several sequential blocks to reach lock
    carry_a = carry_b = pll_init()
    for s in range(0, 2 * 7350, 7350):
        blk = jnp.asarray(x[s:s + 7350])
        _, carry_a = pll_scan(blk, carry_a, p)
    carry_b = carry_a
    # then compare tiers block by block
    for s in range(2 * 7350, 6 * 7350, 7350):
        blk = jnp.asarray(x[s:s + 7350])
        ca, carry_a = pll_scan(blk, carry_a, p)
        cb, carry_b = pll_newton(blk, carry_b, p, iters=3)
        assert snr_db(np.asarray(ca), np.asarray(cb)) > 40


def test_pll_newton_matches_scan_from_cold_start():
    # acquisition transient: the chunked Newton must track the sequential
    # loop from the very first block (phase slews hard before lock)
    fs, f = 240_000, 19_000
    p = PllParams(freq=f, fs=fs, nco_scale=2.0, norm_bw=0.01)
    x = _pilot_signal(3 * 7350, fs, f + 60.0, phase0=2.1, noise=0.05, seed=3)
    carry_a = carry_b = pll_init()
    for s in range(0, 3 * 7350, 7350):
        blk = jnp.asarray(x[s:s + 7350])
        ca, carry_a = pll_scan(blk, carry_a, p)
        cb, carry_b = pll_newton(blk, carry_b, p, iters=3)
        assert snr_db(np.asarray(ca), np.asarray(cb)) > 40


def test_pll_newton_rds_bandwidth():
    # RDS configuration: 114 kHz pilot, ncoScale 0.5, very narrow loop
    fs, f = 240_000, 114_000
    p = PllParams(freq=f, fs=fs, nco_scale=0.5, norm_bw=0.001)
    x = _pilot_signal(4 * 7350, fs, f + 5.0, noise=0.1, seed=4)
    carry_a = carry_b = pll_init()
    for s in range(0, 4 * 7350, 7350):
        blk = jnp.asarray(x[s:s + 7350])
        ca, carry_a = pll_scan(blk, carry_a, p)
        cb, carry_b = pll_newton(blk, carry_b, p, iters=3)
        assert snr_db(np.asarray(ca), np.asarray(cb)) > 40
