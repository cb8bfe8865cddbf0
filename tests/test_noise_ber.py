"""RDS BER and decode robustness under channel noise.

The BASELINE contract names "audio SNR + RDS BER parity" as the metric
family; this measures raw post-differential BER against the transmitted
bit stream and requires protocol decode to survive realistic noise.
"""

import numpy as np
import jax.numpy as jnp

from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.models.rds_framing import RdsFramer
from real_time_sdr_tpu.utils import synth


def measure_ber(out, truth, n_blocks):
    bits_all = []
    nb = np.asarray(out.rds_nbits)
    bits = np.asarray(out.rds_bits)
    for b in range(n_blocks):
        if nb[b] > 0:
            bits_all.extend(bits[b][:nb[b]].tolist())
    got = "".join(map(str, bits_all))
    ref = "".join(map(str, truth["bits"] * 40))
    best = None
    for off in range(len(truth["bits"]) * 2):
        seg = ref[off:off + len(got)]
        errs = sum(a != b for a, b in zip(got, seg))
        if best is None or errs < best:
            best = errs
    return best / max(1, len(got)), len(got)


def test_rds_ber_clean_and_noisy():
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    nb = 30

    iq, truth = synth.station_iq(rx.cfg, nb, ps_name="BERTEST ", pi=0x4242,
                                 pty=2)
    _, out = rx.run_segment(rx.init_state(), jnp.asarray(iq))
    ber, n = measure_ber(out, truth, nb)
    assert n > 700
    assert ber < 5e-3, f"clean BER {ber}"  # only settle-time errors

    # moderate AWGN (sigma=0.05 on unit-amplitude IQ ~ 26 dB CNR)
    iq2, truth2 = synth.station_iq(rx.cfg, nb, ps_name="BERTEST ", pi=0x4242,
                                   pty=2, noise_std=0.05)
    _, out2 = rx.run_segment(rx.init_state(), jnp.asarray(iq2))
    ber2, _ = measure_ber(out2, truth2, nb)
    assert ber2 < 2e-2, f"noisy BER {ber2}"
    framer = RdsFramer()
    bits, nbs = np.asarray(out2.rds_bits), np.asarray(out2.rds_nbits)
    for b in range(nb):
        if nbs[b] > 0:
            framer.feed(bits[b][:nbs[b]])
    assert framer.events.ps_name == "BERTEST "  # protocol survives noise


def _decode_ps(rx, iq, nb):
    _, out = rx.run_segment(rx.init_state(), jnp.asarray(iq))
    framer = RdsFramer()
    bits, nbs = np.asarray(out.rds_bits), np.asarray(out.rds_nbits)
    for b in range(nb):
        if nbs[b] > 0:
            framer.feed(bits[b][:nbs[b]])
    return out, framer


def test_rds_survives_multipath_fading():
    """Two-ray multipath with slow Doppler fading + mild AWGN: the decoder
    must hold sync and recover the PS name (no recordings exist in this
    image; this is the synthetic stand-in for off-air validation)."""
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    nb = 30
    iq, truth = synth.station_iq(rx.cfg, nb, ps_name="FADETEST", pi=0x5151,
                                 pty=4)
    iq = synth.impair_iq(
        iq, rx.cfg.rf_fs,
        multipath=[(2e-6, 0.30, 1.1), (5e-6, 0.15, -0.7)],
        doppler_hz=1.5, noise_std=0.02)
    out, framer = _decode_ps(rx, iq, nb)
    ber, n = measure_ber(out, truth, nb)
    assert n > 700
    assert ber < 2e-2, f"multipath BER {ber}"
    assert framer.events.ps_name == "FADETEST"


def test_rds_survives_frequency_drift():
    """Tuner ppm error (+-400 Hz CFO) plus linear thermal drift: the PLL /
    synchronizer tracks, protocol decode survives."""
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    nb = 30
    iq, truth = synth.station_iq(rx.cfg, nb, ps_name="DRIFTTST", pi=0x6262,
                                 pty=7)
    iq = synth.impair_iq(iq, rx.cfg.rf_fs, freq_offset_hz=400.0,
                         freq_drift_hz_s=-150.0)
    out, framer = _decode_ps(rx, iq, nb)
    ber, n = measure_ber(out, truth, nb)
    assert n > 700
    assert ber < 1e-2, f"drift BER {ber}"
    assert framer.events.ps_name == "DRIFTTST"


def test_rds_survives_time_varying_multipath():
    """Time-varying 2-ray channel (echoes rotating at 0.5/1.0 Hz: the sum
    beats through constructive/destructive fades WITHIN the capture) +
    AWGN: both framer architectures and both CDR timings must keep
    decoding groups, and burst correction must hold PS decode
    (operating-curve gate, examples/ber/multipath; VERDICT r2 #7)."""
    from real_time_sdr_tpu.models.rds_framing import SyncByOffsetDecoder

    nb = 30
    multipath = [(2.0e-6, 0.45, 0.7), (5.3e-6, 0.30, 2.1)]
    for timing in ("comb", "tracked"):
        rx = Receiver(0, stereo=True, rds=True, pll_tier=1,
                      rds_timing=timing)
        iq, truth = synth.station_iq(rx.cfg, nb, ps_name="FADETEST",
                                     pi=0x5050, pty=3)
        iq = synth.impair_iq(iq, rx.cfg.rf_fs, multipath=multipath,
                             doppler_hz=0.5, noise_std=0.12)
        _, out = rx.run_segment(rx.init_state(), jnp.asarray(iq))
        ber, n = measure_ber(out, truth, nb)
        assert n > 700, f"{timing}: only {n} bits"
        assert ber < 2e-2, f"{timing}: BER {ber}"
        bits = np.asarray(out.rds_bits)
        nbs = np.asarray(out.rds_nbits)
        for fr in (RdsFramer(correct_bursts=2),
                   SyncByOffsetDecoder(correct_bursts=2)):
            for b in range(nb):
                if nbs[b] > 0:
                    fr.feed(bits[b][:nbs[b]])
            name = type(fr).__name__
            assert fr.events.groups_decoded >= 6, (
                f"{timing}/{name}: {fr.events.groups_decoded} groups")
            assert fr.events.ps_name == "FADETEST", f"{timing}/{name}"


def test_decode_survives_tuner_artifacts():
    """Datasheet-typical RTL-SDR receiver analog artifacts ALL AT ONCE —
    0.5 dB / 2 deg IQ imbalance (image at -f), 3%+2% DC offset (the center
    spike), 30 Hz-linewidth oscillator phase noise, 400 Hz CFO and mild
    AWGN: stereo tones AND RDS PS decode must survive. Synthetic stand-in
    for the reference's off-air capture loop (model/fmMonoBasic.py:30-42;
    VERDICT r3 next #7)."""
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    nb = 30
    iq, truth = synth.station_iq(rx.cfg, nb, ps_name="TUNERTST", pi=0x7373,
                                 pty=5, tone_left=600.0, tone_right=1700.0)
    iq = synth.impair_iq(
        iq, rx.cfg.rf_fs,
        iq_gain_db=0.5, iq_phase_deg=2.0,
        dc_offset=0.03 + 0.02j,
        phase_noise_linewidth_hz=30.0,
        freq_offset_hz=400.0, noise_std=0.02)
    out, framer = _decode_ps(rx, iq, nb)
    ber, n = measure_ber(out, truth, nb)
    assert n > 700
    assert ber < 2e-2, f"tuner-artifact BER {ber}"
    assert framer.events.ps_name == "TUNERTST"
    assert framer.events.pi == 0x7373
    fs = float(rx.cfg.audio_fs)
    for rail, tone in ((np.asarray(out.left), 600.0),
                       (np.asarray(out.right), 1700.0)):
        rail = rail[len(rail) // 3:]
        sp = np.abs(np.fft.rfft(rail * np.hanning(len(rail))))
        got = np.fft.rfftfreq(len(rail), 1 / fs)[sp.argmax()]
        assert abs(got - tone) < 10, f"tone {tone}: got {got:.0f}"


def test_tuner_artifacts_individually():
    """Each tuner artifact alone at ABOVE-datasheet severity (2 dB / 5 deg
    imbalance, 8% DC, 100 Hz linewidth): PS decode must survive each one,
    bounding which artifact breaks first as levels rise."""
    cases = [
        ("iq_imbalance", dict(iq_gain_db=2.0, iq_phase_deg=5.0)),
        ("dc_offset", dict(dc_offset=0.08 + 0.05j)),
        ("phase_noise", dict(phase_noise_linewidth_hz=100.0)),
    ]
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    nb = 30
    for name, kw in cases:
        iq, truth = synth.station_iq(rx.cfg, nb, ps_name="ARTIFACT",
                                     pi=0x0707, pty=6)
        iq = synth.impair_iq(iq, rx.cfg.rf_fs, **kw)
        out, framer = _decode_ps(rx, iq, nb)
        ber, n = measure_ber(out, truth, nb)
        assert n > 700, f"{name}: only {n} bits"
        assert ber < 2e-2, f"{name}: BER {ber}"
        assert framer.events.ps_name == "ARTIFACT", name
