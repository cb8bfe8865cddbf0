"""RF front end: uint8 IQ block -> FM-demodulated IF block.

TPU-native redesign of the reference's frontend thread
(src/rffrontend.cpp:9-77). The reference deinterleaves with a scalar loop and
runs two decimating FIRs plus the discriminator as separate passes; here the
whole stage is a few fused tensor ops inside one jit region — XLA fuses
normalize/deinterleave into the convolution input and the discriminator into
its output, so the block makes one round trip through HBM.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from real_time_sdr_tpu.config import ReceiverConfig
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.ops.demod import fm_demod
from real_time_sdr_tpu.ops.fir import DualPhaseFIR


class FrontendState(NamedTuple):
    iq_tail: jax.Array  # (2*taps-2,) interleaved overlap-save tail
    prev_i: jax.Array   # carried discriminator samples (src/demod.cpp:21-22)
    prev_q: jax.Array


class Frontend:
    """Per-block: normalize, LPF + decimate I/Q, discriminate.

    The deinterleave never happens explicitly: the dual-phase FIR consumes
    the interleaved stream directly (strided uint8 shuffles are ~3x the cost
    of the whole front end on TPU; see ops.fir.DualPhaseFIR).

    Two implementations share one state contract (so checkpoints and tests
    interchange freely):

    - ``xla``: ops.fir.DualPhaseFIR + ops.demod.fm_demod, fully fused by XLA
      except for the frame-matrix materialization;
    - ``pallas``: ops.pallas.frontend_fused.FusedFrontendFIR — one Mosaic
      kernel reading the raw bytes once and writing only the demod signal
      (the production TPU path; ``interpret=True`` runs it on CPU for tests).

    Selection: explicit ``impl`` argument, else the RTSDR_FRONTEND env var,
    else "pallas" on TPU and "xla" elsewhere ("auto").
    """

    def __init__(self, cfg: ReceiverConfig, impl: str | None = None):
        self.cfg = cfg
        h_rf = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
        impl = impl or os.environ.get("RTSDR_FRONTEND", "auto")
        if impl == "auto":
            # Mosaic kernels need a real TPU backend ("axon" is the
            # tunneled TPU platform); any other accelerator (gpu, plugin)
            # must take the portable XLA path, not fail at lowering
            impl = ("pallas" if jax.default_backend() in ("tpu", "axon")
                    else "xla")
        self.impl = impl
        if impl == "pallas" or impl == "pallas_interpret":
            from real_time_sdr_tpu.ops.pallas.frontend_fused import \
                FusedFrontendFIR
            self.rf_fir = FusedFrontendFIR(
                h_rf, down=cfg.rf_decim,
                interpret=(impl == "pallas_interpret"))
        else:
            assert impl == "xla", impl
            self.rf_fir = DualPhaseFIR(h_rf, down=cfg.rf_decim)

    def init_state(self, batch: tuple = ()) -> FrontendState:
        # raw uint8 tail; 128 is the "zero-signal" byte
        z = jnp.full(batch + (self.rf_fir.tail_len,), 128, jnp.uint8)
        s = jnp.zeros(batch, jnp.float32)
        return FrontendState(z, s, s)

    def __call__(self, iq_u8: jax.Array, state: FrontendState):
        """iq_u8: (..., 2*block_size_iq) uint8 interleaved I,Q.

        Returns (fm_demod (..., if_block), new_state)."""
        if self.impl != "xla":
            demod, iq_tail, prev_i, prev_q = self.rf_fir(
                iq_u8, state.iq_tail, state.prev_i, state.prev_q)
        else:
            i_ds, q_ds, iq_tail = self.rf_fir(iq_u8, state.iq_tail)
            demod, prev_i, prev_q = fm_demod(i_ds, q_ds, state.prev_i,
                                             state.prev_q)
        return demod, FrontendState(iq_tail, prev_i, prev_q)

    # -- host-staged ingest (pallas impl only) -----------------------------

    def staged_len(self, n2: int) -> int:
        """Padded host-staging length for an n2-byte segment."""
        return self.rf_fir.staged_len(n2)  # AttributeError on the xla impl

    def stage_segment(self, prev_tail_u8, seg_u8, out=None,
                      rows: bool = False):
        """HOST staging: [tail | segment | 0x80 pad] (numpy, batch dims
        ok); ``rows=True`` returns the pre-shaped int8 rows form (zero
        device-side prep — see FusedFrontendFIR.stage_segment)."""
        return self.rf_fir.stage_segment(prev_tail_u8, seg_u8, out=out,
                                         rows=rows)

    def stage_segment_full(self, prev_tail_u8, seg_u8, out=None):
        """ROWS-form staging + the small (bnd, tail) auxiliary operands
        that keep the Mosaic kernel the big operand's ONLY consumer (no
        whole-operand relayout copy — FusedFrontendFIR.stage_segment_full
        has the measured numbers). Returns (rows, bnd, tail)."""
        return self.rf_fir.stage_segment_full(prev_tail_u8, seg_u8,
                                              out=out)

    def call_staged(self, xp_u8: jax.Array, n2: int, state: FrontendState,
                    aux=None):
        """Staged twin of ``__call__``: xp_u8 (..., staged_len(n2)) carries
        the tail+pad already (host ingest), so the device-side staging
        copies never run. ``state.iq_tail`` is ignored on entry (the staged
        bytes embed the tail) but the returned state is fully consistent —
        staged and unstaged calls interleave freely (bit-identical;
        tests/test_pallas_frontend.py). ``aux``: (bnd, tail) from
        ``stage_segment_full``."""
        demod, iq_tail, prev_i, prev_q = self.rf_fir.call_staged(
            xp_u8, n2, state.prev_i, state.prev_q, aux=aux)
        return demod, FrontendState(iq_tail, prev_i, prev_q)
