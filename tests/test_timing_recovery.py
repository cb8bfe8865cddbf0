"""Tracking symbol-clock recovery vs the per-block argmax CDR.

The reference's alt model tracks symbol timing with a Muller-Mueller loop
(model/pySDRRDS.py:36-55); its production CDR re-estimates an integer comb
phase per block (src/rds_utilities.cpp:4-21) and slips a symbol whenever a
transmitter clock ppm error wraps the comb phase — exactly the impairment a
real tuner front end has. ops.rds_bits.cdr_tracked follows the drift with a
fractional interpolating slicer; these tests pin both the win and the
zero-impairment parity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.models.rds_framing import RdsFramer
from real_time_sdr_tpu.utils import synth
from tests.test_noise_ber import measure_ber


def _run(rx, iq, nb):
    _, out = rx.run_segment(rx.init_state(), jnp.asarray(iq))
    framer = RdsFramer()
    bits, nbs = np.asarray(out.rds_bits), np.asarray(out.rds_nbits)
    for b in range(nb):
        if nbs[b] > 0:
            framer.feed(bits[b][:nbs[b]])
    return out, framer


def test_tracked_timing_clean_parity():
    """With a perfect symbol clock the tracking CDR decodes as cleanly as
    the fixed comb (settle errors only)."""
    nb = 24
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1, rds_timing="tracked")
    iq, truth = synth.station_iq(rx.cfg, nb, ps_name="TRACK-OK", pi=0x1111,
                                 pty=5)
    out, framer = _run(rx, iq, nb)
    ber, n = measure_ber(out, truth, nb)
    assert n > 500
    assert ber < 5e-3, f"clean tracked BER {ber}"
    assert framer.events.ps_name == "TRACK-OK"


@pytest.mark.parametrize("ppm", [400.0, -400.0])
def test_tracked_timing_follows_clock_ppm(ppm):
    """A +-400 ppm transmitter symbol clock wraps one full comb phase
    within the fixture; the tracking CDR must follow (low BER, PS decoded)
    and must beat the fixed comb, whose slip corrupts the wrap block."""
    nb = 40
    cfg_kw = dict(ps_name="PPMTRACK", pi=0x2222, pty=5, rds_clock_ppm=ppm)
    rx_t = Receiver(0, stereo=True, rds=True, pll_tier=1,
                    rds_timing="tracked")
    iq, truth = synth.station_iq(rx_t.cfg, nb, **cfg_kw)

    out_t, framer_t = _run(rx_t, iq, nb)
    ber_t, n_t = measure_ber(out_t, truth, nb)

    rx_c = Receiver(0, stereo=True, rds=True, pll_tier=1, rds_timing="comb")
    out_c, _ = _run(rx_c, iq, nb)
    ber_c, _ = measure_ber(out_c, truth, nb)

    assert n_t > 900
    assert ber_t < 3e-3, f"tracked BER {ber_t} at {ppm} ppm"
    assert framer_t.events.ps_name == "PPMTRACK"
    assert ber_t <= ber_c, (f"tracking ({ber_t}) should not lose to the "
                            f"fixed comb ({ber_c}) at {ppm} ppm")

    # the drift accumulator locks onto the true per-symbol deviation
    # (right sign, right order of magnitude; the integrator keeps settling
    # beyond this fixture's 40 blocks)
    rate = float(np.asarray(_final_rate(rx_t, iq)))
    expect = rx_t.cfg.sps * (1.0 / (1.0 + ppm * 1e-6) - 1.0)
    assert rate * expect > 0, (rate, expect)
    assert 0.3 * abs(expect) < abs(rate) < 3.0 * abs(expect), (rate, expect)


def _final_rate(rx, iq):
    state, _ = rx.run_segment(rx.init_state(), jnp.asarray(iq))
    return state.rds.track.rate


def test_cdr_tracked_batched_matches_per_channel():
    """Regression: the interpolating gather must index per channel —
    jnp.take on the flattened array silently read every channel's symbols
    out of channel 0's sample range."""
    from real_time_sdr_tpu.ops.rds_bits import cdr_tracked, timing_init

    rng = np.random.default_rng(11)
    sps, L, C = 10, 200, 3
    sig = rng.standard_normal((C, L)).astype(np.float32)
    b_sym, b_soft, b_n, b_track = cdr_tracked(
        jnp.asarray(sig), timing_init(batch=(C,)), sps,
        max_symbols=L // sps + 1)
    for c in range(C):
        s_sym, s_soft, s_n, s_track = cdr_tracked(
            jnp.asarray(sig[c]), timing_init(), sps,
            max_symbols=L // sps + 1)
        np.testing.assert_array_equal(np.asarray(b_sym)[c],
                                      np.asarray(s_sym), err_msg=f"ch {c}")
        np.testing.assert_allclose(np.asarray(b_soft)[c],
                                   np.asarray(s_soft), rtol=1e-6)
        assert int(np.asarray(b_n)[c]) == int(np.asarray(s_n))
        np.testing.assert_allclose(np.asarray(b_track.offset)[c],
                                   np.asarray(s_track.offset), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b_track.last)[c],
                                   np.asarray(s_track.last), rtol=1e-6)
