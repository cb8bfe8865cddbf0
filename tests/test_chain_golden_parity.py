"""Chain-level parity: the jitted receiver vs the loop-level float64 oracle,
block by block with carried state (the framework's equivalent of the
reference's fm_demod_<k>.bin cross-validation protocol,
model/fmMonoBlock.py:139-141 + src/iofunc.cpp:31-48)."""

import numpy as np
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
