"""Carrier recovery under off-nominal pilot frequency (tuner ppm error).

A real dongle's oscillator error shifts the whole multiplex; the 19 kHz
pilot arrives tens of Hz off. All three synchronizer tiers must keep stereo
separation (the subcarrier moves coherently with the pilot, so a tracking
loop/estimator wins and a fixed 38 kHz oscillator would fail)."""

import numpy as np
import pytest
import jax.numpy as jnp

from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.utils import synth


def band_power(x, fs, f, width=30.0):
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / fs)
    return sp[(freqs > f - width) & (freqs < f + width)].sum()


@pytest.mark.parametrize("tier", [1, 3])
@pytest.mark.parametrize("offset", [-45.0, 60.0])
def test_stereo_tracks_pilot_offset(tier, offset):
    rx = Receiver(0, stereo=True, rds=False, pll_tier=tier)
    cfg = rx.cfg
    n = cfg.block_size_iq * 10
    t = np.arange(n) / cfg.rf_fs
    left = np.sin(2 * np.pi * 440.0 * t)
    right = np.sin(2 * np.pi * 1200.0 * t)
    iq = synth.fm_iq(cfg.rf_fs, n, mono=(left + right) / 2,
                     stereo_diff=(left - right) / 2,
                     pilot_freq=19_000.0 + offset)
    _, out = rx.run_segment(rx.init_state(), jnp.asarray(iq))
    skip = 4 * cfg.audio_block
    l = np.asarray(out.left)[skip:]
    r = np.asarray(out.right)[skip:]
    fs = float(cfg.audio_fs)
    sep_l = band_power(l, fs, 440) / band_power(r, fs, 440)
    sep_r = band_power(r, fs, 1200) / band_power(l, fs, 1200)
    assert sep_l > 20 and sep_r > 20, (sep_l, sep_r)
