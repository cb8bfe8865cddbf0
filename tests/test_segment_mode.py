"""Segment mode must reproduce block-by-block execution (mode 0)."""

import numpy as np
import pytest
import jax.numpy as jnp

from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.models.rds_framing import RdsFramer
from real_time_sdr_tpu.utils import synth


def test_segment_equals_blocks_stereo_rds():
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    nb = 30
    iq, truth = synth.station_iq(rx.cfg, nb, ps_name="SEGMENTD", pi=0x5E67,
                                 pty=4)
    blocks = jnp.asarray(iq.reshape(nb, -1))

    sA, outA = rx.jit_run_blocks(rx.init_state(), blocks)

    sB, outB = rx.run_segment(rx.init_state(), jnp.asarray(iq))

    # audio: integer-ratio mode -> same computation, same order. Block 0 is
    # excluded from the tight bound: the PLL phase wraps mod 4*pi at block
    # boundaries in block mode but only at segment end in segment mode, and
    # during the chaotic acquisition transient that float32 difference is
    # briefly amplified before both lock identically.
    left_blocks = np.asarray(outA.left).reshape(-1)
    left_seg = np.asarray(outB.left)
    ab = rx.cfg.audio_block
    np.testing.assert_allclose(left_seg[ab:], left_blocks[ab:], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(left_seg[:ab], left_blocks[:ab], atol=2e-2)

    # RDS bits: exact per-block semantics preserved
    np.testing.assert_array_equal(np.asarray(outA.rds_bits),
                                  np.asarray(outB.rds_bits))
    np.testing.assert_array_equal(np.asarray(outA.rds_nbits),
                                  np.asarray(outB.rds_nbits))

    # and the decoded text still comes out
    framer = RdsFramer()
    bits = np.asarray(outB.rds_bits)
    nbits = np.asarray(outB.rds_nbits)
    for b in range(nb):
        if nbits[b] > 0:
            framer.feed(bits[b][:nbits[b]])
    assert framer.events.ps_name == "SEGMENTD"


def test_segment_tiled_equals_plain():
    # time-tiled long segment (scan over 2-block chunks) == one wide pass.
    # tier 1: the PLL scan is exact per sample, so equality is tight;
    # tier 3's feedforward slope estimate is per-pass by design, so the
    # tiled run is gated as steady-state SNR + identical decoded bits.
    import jax

    nb, tile = 6, 2
    for tier, exact in [(1, True), (3, False)]:
        rx = Receiver(0, stereo=True, rds=True, pll_tier=tier)
        iq, _ = synth.station_iq(rx.cfg, nb, ps_name="TILETEST")
        seg = jnp.asarray(iq)
        s0 = rx.init_state()
        _, o1 = jax.jit(rx.run_segment)(s0, seg)
        _, o2 = jax.jit(lambda s, x: rx.run_segment_tiled(s, x, tile))(
            s0, seg)
        a, b = np.asarray(o1.left), np.asarray(o2.left)
        assert a.shape == b.shape
        ab = rx.cfg.audio_block
        if exact:
            np.testing.assert_allclose(b[ab:], a[ab:], rtol=2e-4, atol=2e-5)
        else:
            err = np.mean((a[ab:] - b[ab:]) ** 2)
            snr = 10 * np.log10(np.mean(a[ab:] ** 2) / max(err, 1e-30))
            assert snr > 50, f"tier-3 tiled audio diverges: {snr:.1f} dB"
        np.testing.assert_array_equal(np.asarray(o1.rds_nbits),
                                      np.asarray(o2.rds_nbits))
        np.testing.assert_array_equal(np.asarray(o1.rds_bits),
                                      np.asarray(o2.rds_bits))


def test_segment_state_continuity():
    # two consecutive segments == one double-length segment
    rx = Receiver(0, stereo=False, rds=False, pll_tier=1)
    iq, _ = synth.station_iq(rx.cfg, 8)
    half = len(iq) // 2
    s0 = rx.init_state()
    s1, o1 = rx.run_segment(s0, jnp.asarray(iq[:half]))
    s2, o2 = rx.run_segment(s1, jnp.asarray(iq[half:]))
    chunked = np.concatenate([np.asarray(o1.mono), np.asarray(o2.mono)])
    sf, of = rx.run_segment(rx.init_state(), jnp.asarray(iq))
    np.testing.assert_allclose(np.asarray(of.mono), chunked, rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("mode", [2, 3])
def test_segment_equals_blocks_fractional(mode):
    """Modes 2/3 (fractional 147/800 and 147/1280 audio resample): segment
    mode resamples the segment uniformly where the reference truncates
    per block (src/filter.cpp:124) — but at the reference's own block
    geometry the per-block output count is an exact integer
    (if_block * 147 % down == 0), so the polyphase phase is continuous
    across blocks and the two execution orders agree to float reduction
    order, with BIT-IDENTICAL RDS (VERDICT r2 #5: the deviation is
    vacuous at these block sizes, pinned here rather than assumed)."""
    rx = Receiver(mode, stereo=True, rds=True, pll_tier=1)
    assert (rx.cfg.if_block * rx.cfg.audio_up) % rx.cfg.audio_down == 0
    nb = 12
    iq, _ = synth.station_iq(rx.cfg, nb, ps_name="SEGDEV  ")
    blocks = jnp.asarray(iq.reshape(nb, -1))
    _, oA = rx.jit_run_blocks(rx.init_state(), blocks)
    _, oB = rx.run_segment(rx.init_state(), jnp.asarray(iq))

    la = np.asarray(oA.left).reshape(-1)
    lb = np.asarray(oB.left)
    assert la.shape == lb.shape  # no output-count stutter at this geometry
    ab = rx.cfg.audio_block
    snr = 10 * np.log10(np.mean(la[ab:] ** 2) /
                        (np.mean((la[ab:] - lb[ab:]) ** 2) + 1e-30))
    assert snr > 110, f"mode {mode}: segment-vs-block audio {snr:.1f} dB"
    np.testing.assert_array_equal(np.asarray(oA.rds_bits),
                                  np.asarray(oB.rds_bits))
    np.testing.assert_array_equal(np.asarray(oA.rds_nbits),
                                  np.asarray(oB.rds_nbits))
