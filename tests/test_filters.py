"""Filter design parity: our float64 designs vs independently written
closed-form evaluation (and the reference's published constants)."""

import numpy as np
import pytest

from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.config import mode_config


def test_lpf_matches_direct_formula():
    fs, fc, taps = 2.4e6, 100e3, 101
    h = filters.design_lpf(fs, fc, taps)
    nc = fc / (fs / 2)
    m = (taps - 1) / 2
    for i in [0, 1, 13, 50, 77, 100]:
        if i == m:
            base = nc
        else:
            x = np.pi * nc * (i - m)
            base = nc * np.sin(x) / x
        w = np.sin(i * np.pi / taps) ** 2
        assert h[i] == pytest.approx(base * w, rel=1e-12)


def test_lpf_gain_scaling():
    h1 = filters.design_lpf(240e3, 16e3, 101)
    h5 = filters.design_lpf(240e3 * 5, 16e3, 101 * 5, gain=5)
    # DC gain of the upsample-compensated bank is ~5x larger per-phase
    assert h5.sum() == pytest.approx(5 * 1.0, rel=2e-2)
    assert h1.sum() == pytest.approx(1.0, rel=2e-2)


def test_bpf_center_and_dc_rejection():
    # Note: with 101 taps the 1 kHz pilot band is narrower than the filter's
    # transition band, so peak gain is well below unity (~0.21) — matching the
    # reference design; the PLL's atan2 detector is amplitude-invariant.
    h = filters.design_bpf(240e3, 18.5e3, 19.5e3, 101)
    freqs = np.fft.rfftfreq(4096, 1 / 240e3)
    resp = np.abs(np.fft.rfft(h, 4096))
    assert resp[0] < 1e-3
    k19 = np.argmin(np.abs(freqs - 19e3))
    kpeak = np.argmax(resp)
    assert abs(freqs[kpeak] - 19e3) < 500  # response peaks at the pilot
    k38 = np.argmin(np.abs(freqs - 38e3))
    assert resp[k38] < 0.05 * resp[k19]  # 38 kHz well rejected


def test_apf_is_pure_delay():
    h = filters.design_apf(101, gain=1.0)
    assert h[50] == 1.0
    assert np.count_nonzero(h) == 1


def test_rrc_nyquist_property():
    # RRC convolved with itself (raised cosine) must have (near-)zero ISI at
    # symbol-spaced offsets from the peak.
    sps = 39
    fs = 2375.0 * sps
    h = filters.design_rrc(fs, 151)
    rc = np.convolve(h, h)
    peak = np.argmax(rc)
    for k in range(1, 3):
        assert abs(rc[peak + k * sps]) < 0.02 * rc[peak]
        assert abs(rc[peak - k * sps]) < 0.02 * rc[peak]


def test_mode_configs_block_arithmetic():
    m0 = mode_config(0)
    assert m0.block_size_iq == 73_500
    assert m0.if_block == 7_350
    assert m0.audio_block == 1_470
    assert m0.rds_resample == (247, 640)
    assert m0.rds_block == 2_836
    assert float(m0.audio_fs) == 48_000

    m1 = mode_config(1)
    assert float(m1.audio_fs) == 40_000
    m2 = mode_config(2)
    assert float(m2.audio_fs) == pytest.approx(44_100)
    assert m2.rds_fs == 20 * 2375
    m3 = mode_config(3)
    assert float(m3.audio_fs) == pytest.approx(44_100)
    assert m3.block_size_iq == 1470 * 3 * 1280 // 147
