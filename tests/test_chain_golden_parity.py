"""Chain-level parity: the jitted receiver vs the loop-level float64 oracle,
block by block with carried state (the framework's equivalent of the
reference's fm_demod_<k>.bin cross-validation protocol,
model/fmMonoBlock.py:139-141 + src/iofunc.cpp:31-48)."""

import numpy as np
import jax
import jax.numpy as jnp

from golden import dsp
from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.utils import synth


def snr_db(ref, got):
    ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    e = np.mean((ref - got) ** 2)
    return np.inf if e == 0 else 10 * np.log10(np.mean(ref**2) / e)


def test_mono_chain_matches_golden_blocks():
    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    n_blocks = 3
    iq, _ = synth.station_iq(cfg, n_blocks, tone_left=700.0, tone_right=700.0)
    blocks = iq.reshape(n_blocks, -1)

    # golden chain state
    rf_h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    audio_h = filters.design_lpf(cfg.if_fs * cfg.audio_up, cfg.audio_fc,
                                 cfg.rf_taps * cfg.audio_up,
                                 gain=cfg.audio_up)
    st_i = np.zeros(cfg.rf_taps - 1)
    st_q = np.zeros(cfg.rf_taps - 1)
    prev_i = prev_q = 0.0
    st_a = np.zeros(len(audio_h) - 1)

    state = rx.init_state()
    for b in range(n_blocks):
        u8 = blocks[b]
        state, out = rx.jit_step(state, jnp.asarray(u8))

        x = (u8.astype(np.float64) - 128.0) / 128.0
        i_raw, q_raw = x[0::2], x[1::2]
        i_ds, st_i = dsp.fir_block(i_raw, rf_h, st_i, cfg.rf_decim)
        q_ds, st_q = dsp.fir_block(q_raw, rf_h, st_q, cfg.rf_decim)
        fm, prev_i, prev_q = dsp.fm_demod_block(i_ds, q_ds, prev_i, prev_q)
        audio, st_a = dsp.fir_resample_block(fm, audio_h, st_a,
                                             cfg.audio_up, cfg.audio_down)
        assert snr_db(audio, np.asarray(out.mono)) > 60, f"block {b}"


def test_stereo_chain_matches_golden_blocks():
    from real_time_sdr_tpu import config as C
    rx = Receiver(0, stereo=True, rds=False, pll_tier=1)
    cfg = rx.cfg
    n_blocks = 3
    iq, _ = synth.station_iq(cfg, n_blocks, tone_left=500.0,
                             tone_right=1500.0)
    blocks = iq.reshape(n_blocks, -1)

    rf_h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    audio_h = filters.design_lpf(cfg.if_fs, cfg.audio_fc, cfg.rf_taps)
    pilot_h = filters.design_bpf(cfg.if_fs, *C.PILOT_BAND, cfg.rf_taps)
    band_h = filters.design_bpf(cfg.if_fs, *C.STEREO_BAND, cfg.rf_taps)
    apf_h = filters.design_apf(cfg.rf_taps)

    st_i = np.zeros(cfg.rf_taps - 1); st_q = np.zeros(cfg.rf_taps - 1)
    prev_i = prev_q = 0.0
    st_pilot = np.zeros(cfg.rf_taps - 1); st_band = np.zeros(cfg.rf_taps - 1)
    st_delay = np.zeros(cfg.rf_taps - 1)
    st_mono = np.zeros(cfg.rf_taps - 1); st_sub = np.zeros(cfg.rf_taps - 1)
    pll_state = dsp.PllState()

    state = rx.init_state()
    for b in range(n_blocks):
        u8 = blocks[b]
        state, out = rx.jit_step(state, jnp.asarray(u8))

        x = (u8.astype(np.float64) - 128.0) / 128.0
        i_ds, st_i = dsp.fir_block(x[0::2], rf_h, st_i, cfg.rf_decim)
        q_ds, st_q = dsp.fir_block(x[1::2], rf_h, st_q, cfg.rf_decim)
        fm, prev_i, prev_q = dsp.fm_demod_block(i_ds, q_ds, prev_i, prev_q)
        pilot, st_pilot = dsp.fir_block(fm, pilot_h, st_pilot, 1)
        carrier_full, pll_state = dsp.pll_block(
            pilot, 19_000, cfg.if_fs, pll_state, nco_scale=2.0,
            norm_bw=0.01)
        carrier = carrier_full[:len(fm)]
        band, st_band = dsp.fir_block(fm, band_h, st_band, 1)
        sub_dc = 2.0 * band * carrier
        mono_del, st_delay = dsp.fir_block(fm, apf_h, st_delay, 1)
        mono, st_mono = dsp.fir_resample_block(mono_del, audio_h, st_mono,
                                               cfg.audio_up, cfg.audio_down)
        sub, st_sub = dsp.fir_resample_block(sub_dc, audio_h, st_sub,
                                             cfg.audio_up, cfg.audio_down)
        left = mono + sub
        if b > 0:  # skip the acquisition-transient block
            assert snr_db(left, np.asarray(out.left)) > 40, f"block {b}"


def test_rds_chain_clean_matches_golden_blocks():
    from real_time_sdr_tpu import config as C
    rx = Receiver(0, stereo=False, rds=True, pll_tier=1)
    cfg = rx.cfg
    n_blocks = 3
    iq, _ = synth.station_iq(cfg, n_blocks)
    blocks = iq.reshape(n_blocks, -1)
    up, down = cfg.rds_resample

    rf_h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    band_h = filters.design_bpf(cfg.if_fs, *C.RDS_BAND, cfg.rf_taps)
    sq_h = filters.design_bpf(cfg.if_fs, *C.RDS_SQUARED_BAND, cfg.rf_taps)
    apf_h = filters.design_apf(cfg.rf_taps)
    bb_h = filters.design_lpf(cfg.if_fs * up, 3_000.0, cfg.rf_taps * up,
                              gain=up)
    rrc_h = filters.design_rrc(cfg.rds_fs, cfg.rf_taps)

    # device side: run Frontend + RdsPath standalone to expose `clean`
    from real_time_sdr_tpu.models.rds import RdsPath
    from real_time_sdr_tpu.models.frontend import Frontend
    fe = Frontend(cfg)
    rp = RdsPath(cfg, pll_tier=1)
    fs_ = fe.init_state(); rs_ = rp.init_state()
    st_i = np.zeros(cfg.rf_taps - 1); st_q = np.zeros(cfg.rf_taps - 1)
    prev_i = prev_q = 0.0
    st_band = np.zeros(cfg.rf_taps - 1); st_sq = np.zeros(cfg.rf_taps - 1)
    st_delay = np.zeros(cfg.rf_taps - 1)
    st_bb = np.zeros(-(-len(bb_h) // up) - 1)
    st_rrc = np.zeros(cfg.rf_taps - 1)
    pll_state = dsp.PllState()
    for b in range(n_blocks):
        u8 = blocks[b]
        demod_dev, fs_ = jax.jit(fe.__call__)(jnp.asarray(u8), fs_)
        (bits, nb_, clean_dev), rs_ = jax.jit(rp.__call__)(demod_dev, rs_)

        x = (u8.astype(np.float64) - 128.0) / 128.0
        i_ds, st_i = dsp.fir_block(x[0::2], rf_h, st_i, cfg.rf_decim)
        q_ds, st_q = dsp.fir_block(x[1::2], rf_h, st_q, cfg.rf_decim)
        fm, prev_i, prev_q = dsp.fm_demod_block(i_ds, q_ds, prev_i, prev_q)
        band, st_band = dsp.fir_block(fm, band_h, st_band, 1)
        pil, st_sq = dsp.fir_block(band * band, sq_h, st_sq, 1)
        car_full, pll_state = dsp.pll_block(pil, 114_000, cfg.if_fs,
                                            pll_state, nco_scale=0.5,
                                            norm_bw=0.001)
        delayed, st_delay = dsp.fir_block(band, apf_h, st_delay, 1)
        mixed = 2.0 * delayed * car_full[:len(fm)]
        filt, st_bb = dsp.fir_resample_block(mixed, bb_h, st_bb, up, down)
        clean, st_rrc = dsp.fir_block(filt, rrc_h, st_rrc, 1)
        if b > 0:
            assert snr_db(clean, np.asarray(clean_dev)) > 40, f"block {b}"
