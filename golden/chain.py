"""Whole-capture golden chain: every pipeline stage as a float64 signal.

Runs the loop-level oracle (golden.dsp) block by block over a raw uint8 IQ
capture and returns each intermediate stage concatenated across blocks —
the reference's per-stage ``logVector`` dump workflow
(src/logfunc.cpp:23-43, data/example.gnuplot:14-22) as one call. Used by
``python -m real_time_sdr_tpu.viz --golden`` to overlay device-vs-oracle
PSDs per stage and report SNR, turning "which stage regressed?" into one
figure.
"""

from __future__ import annotations

import numpy as np

from golden import dsp
from real_time_sdr_tpu import config as C
from real_time_sdr_tpu.ops import filters


def run_stages(cfg, iq_u8: np.ndarray, stereo: bool = True,
               rds: bool = True) -> dict:
    """iq_u8: (nb*2*block_size_iq,) raw interleaved uint8.

    Returns {stage_name: float64 array at that stage's rate} with stages
    concatenated over all whole blocks. Stage set mirrors the receiver:
    demod, pilot, carrier, left/right (stereo), rds_band, rds_mixed,
    rds_clean (rds)."""
    blk = 2 * cfg.block_size_iq
    nb = len(iq_u8) // blk
    blocks = np.asarray(iq_u8[: nb * blk], np.uint8).reshape(nb, blk)

    rf_h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    audio_h = filters.design_lpf(cfg.if_fs * cfg.audio_up, cfg.audio_fc,
                                 cfg.rf_taps * cfg.audio_up,
                                 gain=cfg.audio_up)
    # polyphase state length is ceil(taps/up) - 1 (the resampler touches
    # only every up-th tap per phase) — NOT taps-1, which breaks the
    # fractional modes 2/3 where audio_up = 147
    n_audio_st = -(-len(audio_h) // cfg.audio_up) - 1
    st_i = np.zeros(cfg.rf_taps - 1)
    st_q = np.zeros(cfg.rf_taps - 1)
    prev_i = prev_q = 0.0
    out: dict[str, list] = {"demod": []}

    if stereo:
        pilot_h = filters.design_bpf(cfg.if_fs, *C.PILOT_BAND, cfg.rf_taps)
        band_h = filters.design_bpf(cfg.if_fs, *C.STEREO_BAND, cfg.rf_taps)
        apf_h = filters.design_apf(cfg.rf_taps)
        st_pilot = np.zeros(cfg.rf_taps - 1)
        st_band = np.zeros(cfg.rf_taps - 1)
        st_delay = np.zeros(cfg.rf_taps - 1)
        st_mono = np.zeros(n_audio_st)
        st_sub = np.zeros(n_audio_st)
        pll_st = dsp.PllState()
        out.update(pilot=[], carrier=[], left=[], right=[])
    else:
        st_mono = np.zeros(n_audio_st)
        out.update(mono=[])

    if rds:
        up, down = cfg.rds_resample
        rband_h = filters.design_bpf(cfg.if_fs, *C.RDS_BAND, cfg.rf_taps)
        sq_h = filters.design_bpf(cfg.if_fs, *C.RDS_SQUARED_BAND,
                                  cfg.rf_taps)
        rapf_h = filters.design_apf(cfg.rf_taps)
        bb_h = filters.design_lpf(cfg.if_fs * up, 3_000.0,
                                  cfg.rf_taps * up, gain=up)
        rrc_h = filters.design_rrc(cfg.rds_fs, cfg.rf_taps)
        st_rband = np.zeros(cfg.rf_taps - 1)
        st_sq = np.zeros(cfg.rf_taps - 1)
        st_rdelay = np.zeros(cfg.rf_taps - 1)
        st_bb = np.zeros(-(-len(bb_h) // up) - 1)
        st_rrc = np.zeros(cfg.rf_taps - 1)
        rpll_st = dsp.PllState()
        out.update(rds_band=[], rds_mixed=[], rds_clean=[])

    for b in range(nb):
        x = (blocks[b].astype(np.float64) - 128.0) / 128.0
        i_ds, st_i = dsp.fir_block(x[0::2], rf_h, st_i, cfg.rf_decim)
        q_ds, st_q = dsp.fir_block(x[1::2], rf_h, st_q, cfg.rf_decim)
        fm, prev_i, prev_q = dsp.fm_demod_block(i_ds, q_ds, prev_i, prev_q)
        out["demod"].append(fm)

        if stereo:
            pilot, st_pilot = dsp.fir_block(fm, pilot_h, st_pilot, 1)
            car_full, pll_st = dsp.pll_block(
                pilot, int(C.PILOT_FREQ), cfg.if_fs, pll_st, nco_scale=2.0,
                norm_bw=C.PLL_BW_STEREO)
            carrier = car_full[: len(fm)]
            band, st_band = dsp.fir_block(fm, band_h, st_band, 1)
            sub_dc = 2.0 * band * carrier
            mono_del, st_delay = dsp.fir_block(fm, apf_h, st_delay, 1)
            mono, st_mono = dsp.fir_resample_block(
                mono_del, audio_h, st_mono, cfg.audio_up, cfg.audio_down)
            sub, st_sub = dsp.fir_resample_block(
                sub_dc, audio_h, st_sub, cfg.audio_up, cfg.audio_down)
            out["pilot"].append(pilot)
            out["carrier"].append(carrier)
            out["left"].append(mono + sub)
            out["right"].append(mono - sub)
        else:
            mono, st_mono = dsp.fir_resample_block(
                fm, audio_h, st_mono, cfg.audio_up, cfg.audio_down)
            out["mono"].append(mono)

        if rds:
            rband, st_rband = dsp.fir_block(fm, rband_h, st_rband, 1)
            pil, st_sq = dsp.fir_block(rband * rband, sq_h, st_sq, 1)
            rcar, rpll_st = dsp.pll_block(
                pil, int(C.RDS_PILOT_FREQ), cfg.if_fs, rpll_st,
                nco_scale=0.5, norm_bw=C.PLL_BW_RDS)
            delayed, st_rdelay = dsp.fir_block(rband, rapf_h, st_rdelay, 1)
            mixed = 2.0 * delayed * rcar[: len(fm)]
            filt, st_bb = dsp.fir_resample_block(mixed, bb_h, st_bb, up,
                                                 down)
            clean, st_rrc = dsp.fir_block(filt, rrc_h, st_rrc, 1)
            out["rds_band"].append(rband)
            out["rds_mixed"].append(mixed)
            out["rds_clean"].append(clean)

    return {k: np.concatenate(v) for k, v in out.items()}


def run_channelizer(cfg, i_wide: np.ndarray, q_wide: np.ndarray,
                    wide_fs: int, offsets_hz, taps_factor: int = 2,
                    segments: int = 1):
    """Float64 oracle twin of models/channelizer.Channelizer.

    Mix each station down by its exact integer-phase tone, low-pass with
    the same design_lpf taps, and decimate — all in float64 with direct
    convolution (no frames, no carried tails: the whole capture at once,
    optionally split into ``segments`` chunks to exercise the device
    model's cross-segment continuity against a single-pass truth).
    Returns (S, N//decim) complex128 station basebands.
    """
    from real_time_sdr_tpu.ops import filters as _filters

    assert wide_fs % cfg.rf_fs == 0
    decim = wide_fs // cfg.rf_fs
    taps = cfg.rf_taps * taps_factor + 1
    h = _filters.design_lpf(wide_fs, cfg.rf_fs / 2 * 0.8, taps)
    z = i_wide.astype(np.float64) + 1j * q_wide.astype(np.float64)
    n = len(z)
    k = np.arange(n, dtype=np.int64)
    out = []
    for f in offsets_hz:
        fr = int(f) % wide_fs
        frac = ((fr * k) % wide_fs).astype(np.float64) / wide_fs
        mixed = z * np.exp(-2j * np.pi * frac)
        # causal streaming convolution: y[t] = sum_k h[k] * x[t-k]
        filt = np.convolve(mixed, h)[:n]
        out.append(filt[::decim])
    return np.stack(out)
