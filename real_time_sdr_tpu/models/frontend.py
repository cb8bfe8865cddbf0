"""RF front end: uint8 IQ block -> FM-demodulated IF block.

TPU-native redesign of the reference's frontend thread
(src/rffrontend.cpp:9-77). The reference deinterleaves with a scalar loop and
runs two decimating FIRs plus the discriminator as separate passes; here the
whole stage is a few fused tensor ops inside one jit region — XLA fuses
normalize/deinterleave into the convolution input and the discriminator into
its output, so the block makes one round trip through HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from real_time_sdr_tpu.config import ReceiverConfig
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.ops.demod import fm_demod
from real_time_sdr_tpu.ops.fir import PolyFIR, state_len


class FrontendState(NamedTuple):
    i_tail: jax.Array   # (taps-1,) RF filter overlap-save tails
    q_tail: jax.Array
    prev_i: jax.Array   # carried discriminator samples (src/demod.cpp:21-22)
    prev_q: jax.Array


class Frontend:
    """Per-block: normalize, deinterleave, LPF + decimate I/Q, discriminate."""

    def __init__(self, cfg: ReceiverConfig):
        self.cfg = cfg
        h_rf = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
        self.rf_fir = PolyFIR(h_rf, up=1, down=cfg.rf_decim)
        self._tail = state_len(cfg.rf_taps)

    def init_state(self, batch: tuple = ()) -> FrontendState:
        z = jnp.zeros(batch + (self._tail,), jnp.float32)
        s = jnp.zeros(batch, jnp.float32)
        return FrontendState(z, z, s, s)

    def __call__(self, iq_u8: jax.Array, state: FrontendState):
        """iq_u8: (..., 2*block_size_iq) uint8 interleaved I,Q.

        Returns (fm_demod (..., if_block), new_state)."""
        x = (iq_u8.astype(jnp.float32) - 128.0) / 128.0
        i_raw = x[..., 0::2]
        q_raw = x[..., 1::2]
        i_ds, i_tail = self.rf_fir(i_raw, state.i_tail)
        q_ds, q_tail = self.rf_fir(q_raw, state.q_tail)
        demod, prev_i, prev_q = fm_demod(i_ds, q_ds, state.prev_i,
                                         state.prev_q)
        return demod, FrontendState(i_tail, q_tail, prev_i, prev_q)
