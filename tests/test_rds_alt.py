"""Alternative RDS architecture (models/rds_alt): the pySDRRDS twin.

Reference chain under test: model/pySDRRDS.py — freq shift to complex
baseband (18-23), LPF+resample to 19 kHz (25-34), Mueller-Muller timing
(36-55), Costas fine-frequency sync (60-84), slice + differential decode
(88-90), sync-by-offset framing (96+)."""

import numpy as np
import pytest

from real_time_sdr_tpu.config import mode_config
from real_time_sdr_tpu.models.rds_alt import AltRdsReceiver
from real_time_sdr_tpu.utils.synth import station_iq

CFG = mode_config(0)


def _station(n_blocks=24, **kw):
    return station_iq(CFG, n_blocks, ps_name="ALT-PATH", pi=0x2ABC, **kw)


@pytest.mark.smoke
def test_clean_decode():
    iq, _ = _station()
    dec, diag = AltRdsReceiver(CFG).decode(iq)
    assert dec.synced
    assert dec.events.ps_name == "ALT-PATH"
    assert dec.events.pi == 0x2ABC
    assert dec.events.groups_decoded >= 5
    # constellation collapses to the real axis once Costas locks
    d = diag.derotated[200:]
    assert np.mean(d.real ** 2) > 100 * np.mean(d.imag ** 2)


def test_costas_pulls_in_carrier_offset():
    """+200 ppm tuner error: the 19 kHz pilot moves +3.8 Hz, so the 57 kHz
    subcarrier (3x pilot) lands +11.4 Hz off the fixed mix frequency — a
    residual the Costas loop must acquire and track (the coherent-PLL
    production path gets this from the pilot instead)."""
    df_pilot = 19_000.0 * 200e-6
    iq, _ = _station(n_blocks=32, pilot_freq=19_000.0 + df_pilot)
    dec, diag = AltRdsReceiver(CFG).decode(iq)
    assert dec.synced
    assert dec.events.ps_name == "ALT-PATH"
    # the frequency estimate converges to the true offset
    f_true = 3.0 * df_pilot
    f_est = np.median(diag.freq_log[-200:])
    assert abs(f_est - f_true) < 1.5, (f_est, f_true)


def test_mm_tracks_symbol_clock_ppm():
    """+-300 ppm transmitter symbol clock: the M&M loop's average advance
    must deviate from 16 by the same ppm (drift the fixed comb cannot
    follow; cf. tests/test_timing_recovery.py for the production path)."""
    iq, _ = _station(n_blocks=32, rds_clock_ppm=300.0)
    dec, diag = AltRdsReceiver(CFG).decode(iq)
    assert dec.synced and dec.events.ps_name == "ALT-PATH"


def test_comb_acquire_unit():
    import jax.numpy as jnp

    from real_time_sdr_tpu.ops.symbol_timing import comb_acquire
    rng = np.random.default_rng(0)
    sps, true_phase = 16, 11
    sym = rng.choice([-1.0, 1.0], size=400)
    z = np.zeros(400 * sps, np.complex64)
    z[true_phase::sps] = sym          # impulses at the true instants
    # triangular pulse so the parabolic fit has neighbours to work with
    z = np.convolve(z, [0.5, 1.0, 0.5], mode="same").astype(np.complex64)
    got = float(comb_acquire(jnp.asarray(z), sps))
    assert abs(got - true_phase) < 0.25, got


def test_mm_fast_clock_does_not_truncate_tail():
    """A fast symbol clock produces MORE than n/sps symbols; the output
    buffer bound must cover the excess or the loop silently drops the tail
    (regression: old bound int(n/sps)+4 truncated at +400 ppm on long
    captures)."""
    import jax.numpy as jnp

    from real_time_sdr_tpu.ops.filters import design_rrc
    from real_time_sdr_tpu.ops.symbol_timing import mm_timing

    sps, n_sym = 16.0, 30_000          # ~25 s of RDS, fast TX clock
    eff_sps = sps * (1.0 - 2000e-6)    # fewer samples per symbol = fast TX
    rng = np.random.default_rng(1)
    sym = rng.choice([-1.0, 1.0], size=n_sym)
    pos = np.arange(n_sym) * eff_sps
    n = int(pos[-1]) + int(sps) + 2
    # impulses at fractional instants (linear split), RRC pulse shaping
    z = np.zeros(n + 1, np.float64)
    i0 = pos.astype(np.int64)
    np.add.at(z, i0, sym * (1.0 - (pos - i0)))
    np.add.at(z, i0 + 1, sym * (pos - i0))
    rrc = np.asarray(design_rrc(2375.0 * sps, 151), np.float64)
    z = np.convolve(z, rrc, mode="same")[:n].astype(np.complex64)
    syms, n_valid = mm_timing(jnp.asarray(z), sps, gain=0.05, mu0=0.0)
    expect = n / eff_sps               # true symbol count in the capture
    # the loop must run past the OLD buffer bound (int(n/sps)+4) and land
    # near the true count (small slack for the acquisition transient)
    assert int(n_valid) > int(n / sps) + 4, (int(n_valid), n / sps)
    assert int(n_valid) >= expect * 0.998, (int(n_valid), expect)
    assert int(n_valid) < syms.shape[-1]   # exited on input, not the buffer
