"""Wideband channelizer: one capture -> many station basebands.

A capability beyond the reference (which relies on the RTL-SDR tuner to
deliver one station per 2.4 MS/s stream): ingest a single wideband IQ
capture and extract every station in it on-device, feeding the channel-bank
receivers. This is the "64+ FM stations channelized and demodulated in
parallel" configuration of the project north star.

Per station: complex mix by the offset tone, then low-pass + decimate both
rails with the framed-matmul FIR (batched over stations).

Mixer exactness: the per-sample tone table exp(-2*pi*j*(f*k mod fs)/fs) is
computed on the host with arbitrary-precision integer phase reduction (a
device-side f*k product overflows int32 by orders of magnitude) and cached
as a device constant per segment length; cross-segment phase continuity is
carried as a unit phasor advanced by the per-segment rotation (computed in
f64 on the host, then stored/multiplied in f32 on device — so continuity is
accurate to f32, ~1e-7 rad/segment, not bit-exact) and renormalized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from real_time_sdr_tpu.config import ReceiverConfig
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.ops.fir import PolyFIR


class ChannelizerState(NamedTuple):
    i_tails: jax.Array   # (S, T-1) per-station decimator tails
    q_tails: jax.Array
    ph_re: jax.Array     # (S,) carried tone phasor (segment continuity)
    ph_im: jax.Array


class Channelizer:
    """Extract S stations from a wideband complex capture.

    wide_fs must be an integer multiple of the per-station rate
    (cfg.rf_fs); offsets_hz are integer station offsets from the capture
    center.
    """

    def __init__(self, cfg: ReceiverConfig, wide_fs: int,
                 offsets_hz: list[int], taps_factor: int = 2):
        assert wide_fs % cfg.rf_fs == 0
        self.cfg = cfg
        self.wide_fs = int(wide_fs)
        self.decim = self.wide_fs // cfg.rf_fs
        self.offsets = [int(f) for f in offsets_hz]
        taps = cfg.rf_taps * taps_factor + 1
        h = filters.design_lpf(self.wide_fs, cfg.rf_fs / 2 * 0.8, taps)
        self.fir = PolyFIR(h, up=1, down=self.decim)
        self._tone_cache: dict[int, tuple] = {}

    def _tones(self, n: int):
        """Exact (S, n) float32 cos/sin tables of -2*pi*f*k/fs, plus the
        per-segment continuation rotations (S,) complex128."""
        if n in self._tone_cache:
            return self._tone_cache[n]
        p = self.wide_fs
        k = np.arange(n, dtype=np.int64)
        cs, sn, rots = [], [], []
        for f in self.offsets:
            fr = f % p
            assert fr * n < 2**63  # int64 modular phase stays exact
            frac = ((fr * k) % p).astype(np.float64) / p
            ang = -2.0 * np.pi * frac
            cs.append(np.cos(ang))
            sn.append(np.sin(ang))
            rots.append(np.exp(-2j * np.pi * ((fr * n) % p) / p))
        tone_c = jnp.asarray(np.stack(cs).astype(np.float32))
        tone_s = jnp.asarray(np.stack(sn).astype(np.float32))
        rot = np.array(rots)
        out = (tone_c, tone_s,
               jnp.asarray(rot.real.astype(np.float32)),
               jnp.asarray(rot.imag.astype(np.float32)))
        self._tone_cache[n] = out
        return out

    def init_state(self) -> ChannelizerState:
        s = len(self.offsets)
        t = jnp.zeros((s, self.fir.tail_len), jnp.float32)
        return ChannelizerState(t, t, jnp.ones((s,), jnp.float32),
                                jnp.zeros((s,), jnp.float32))

    def __call__(self, i_wide: jax.Array, q_wide: jax.Array,
                 state: ChannelizerState):
        """i_wide, q_wide: (N,) float32 at wide_fs.

        Returns ((S, N//decim) i/q station basebands, new state)."""
        n = i_wide.shape[-1]
        tone_c, tone_s, rot_re, rot_im = self._tones(n)
        # effective tone = table * carried phasor (complex multiply)
        c = tone_c * state.ph_re[:, None] - tone_s * state.ph_im[:, None]
        s_ = tone_s * state.ph_re[:, None] + tone_c * state.ph_im[:, None]
        # (i + jq) * (c + j s_): downshift by +offset
        mi = i_wide[None, :] * c - q_wide[None, :] * s_
        mq = q_wide[None, :] * c + i_wide[None, :] * s_
        # both rails through ONE framed-matmul dispatch (stays 2-D per call)
        s_ch = len(self.offsets)
        ds, tails = self.fir(
            jnp.concatenate([mi, mq], axis=0),
            jnp.concatenate([state.i_tails, state.q_tails], axis=0))
        i_ds, q_ds = ds[:s_ch], ds[s_ch:]
        i_tails, q_tails = tails[:s_ch], tails[s_ch:]
        # advance + renormalize the continuity phasor
        pr = state.ph_re * rot_re - state.ph_im * rot_im
        pi_ = state.ph_re * rot_im + state.ph_im * rot_re
        norm = jax.lax.rsqrt(pr * pr + pi_ * pi_)
        new = ChannelizerState(i_tails, q_tails, pr * norm, pi_ * norm)
        return (i_ds, q_ds), new

    def to_uint8(self, i_ds: jax.Array, q_ds: jax.Array) -> jax.Array:
        """Re-encode station basebands to the receivers' interleaved uint8
        interface (one extra quantization, as a hardware tuner would)."""
        s, n = i_ds.shape
        iq = jnp.stack([i_ds, q_ds], axis=-1).reshape(s, 2 * n)
        return jnp.clip(jnp.round(128.0 + 127.0 * iq), 0, 255
                        ).astype(jnp.uint8)
