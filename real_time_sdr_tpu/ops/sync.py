"""Tier-3 carrier synchronizer: feedforward analytic-phase estimation.

The reference regenerates the 38/57 kHz carriers with a per-sample PLL
(src/pll.cpp) — an inherently sequential recurrence. Tiers 1/2 (ops.pll)
reproduce that loop exactly / via block-parallel Newton. This module is the
fully TPU-native alternative: *no recurrence at all*.

    pilot -> [Hilbert FIR + matched delay] -> analytic signal z
          -> rotate by the exact nominal carrier ramp (integer-wrapped)
          -> smooth z with a short FIR (the loop filter's noise-averaging role)
          -> residual phase = atan2(Im, Re); unwrap = one cumsum
          -> carrier = cos(scale * (nominal ramp + residual) + adjust)

Everything is a handful of full-block vectorized ops (two FIRs, trig,
a cumsum), so cost is independent of any loop bandwidth and the graph depth
is O(1) — this is what lets a whole multi-block segment's carrier recovery
run as ~10 TPU kernels.

Semantics: approximates the locked PLL (validated e2e: stereo separation and
RDS BER); it does not reproduce the reference's acquisition transient.
The phase estimate at FIR output k describes input sample k-D (group delay
D); consumers get cos at the (k-1) convention of the reference by advancing
the residual linearly by its measured per-block slope — exact for the
nominal ramp, first-order for the residual.
"""

from __future__ import annotations

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from real_time_sdr_tpu.ops.fir import PolyFIR, make_bank
from real_time_sdr_tpu.ops.pll import PllParams
from real_time_sdr_tpu.ops.prefix import prefix_sum

__all__ = ["FeedforwardSync", "FFSyncCarry"]

_TWO_PI = 2.0 * math.pi
_FOUR_PI = 4.0 * math.pi


def _hilbert_taps(taps: int) -> np.ndarray:
    """Type-III FIR Hilbert transformer, Hann-windowed (odd length)."""
    assert taps % 2 == 1
    m = (taps - 1) // 2
    k = np.arange(taps) - m
    h = np.zeros(taps)
    odd = (k % 2) != 0
    h[odd] = 2.0 / (np.pi * k[odd])
    i = np.arange(taps, dtype=np.float64)
    w = np.sin(i * np.pi / taps) ** 2
    return h * w


class FFSyncCarry(NamedTuple):
    in_tail: jax.Array      # shared input tail (delay line + Hilbert FIR
                            # have the same geometry on the same input, so
                            # one history serves both — models/audio.py's
                            # StereoState pattern)
    sm_i_tail: jax.Array    # smoothing FIR tails (analytic I/Q)
    sm_q_tail: jax.Array
    trig: jax.Array         # int32 global sample counter mod period
    resid: jax.Array        # unwrapped residual phase at the last sample


def _wrap_pi(x):
    return x - _TWO_PI * jnp.round(x / _TWO_PI)


class FeedforwardSync:
    """Drop-in carrier synchronizer with the (pilot, carry, params) call
    signature of ops.pll.pll_scan."""

    def __init__(self, p: PllParams, hilbert_taps: int = 63,
                 smooth_taps: int = 65):
        self.p = p
        h_h = _hilbert_taps(hilbert_taps)
        m = (hilbert_taps - 1) // 2
        delay = np.zeros(hilbert_taps)
        delay[m] = 1.0
        self.q_fir = PolyFIR(h_h)
        self.i_fir = PolyFIR(delay)
        # Smoothing: normalized Hann — plays the loop filter's noise-averaging
        # role (equivalent noise bandwidth ~ fs/smooth_taps). ONE filter
        # object: both analytic rails run through it as a stacked batch.
        i = np.arange(smooth_taps, dtype=np.float64)
        w = np.sin(i * np.pi / smooth_taps) ** 2
        self.sm_fir = PolyFIR(w / w.sum())
        self._q_bank = make_bank([self.q_fir], site="sync")
        self._sm_bank = make_bank([self.sm_fir], site="sync")
        assert self.i_fir.tail_len == self.q_fir.tail_len
        # Hilbert/delay-line group delay: where the analytic signal "is" at
        # FIR output k. The smoother adds (smooth_taps-1)/2 more delay, but
        # only to the slowly-rotating RESIDUAL (the nominal ramp is removed
        # before smoothing) — so the ramp rotation uses m alone and the
        # residual-slope compensation uses the total.
        self.hilbert_delay = m
        self.group_delay = m + (smooth_taps - 1) // 2

    def init(self, batch: tuple = ()) -> FFSyncCarry:
        t = lambda n: jnp.zeros(batch + (n,), jnp.float32)
        return FFSyncCarry(
            in_tail=t(self.q_fir.tail_len),
            sm_i_tail=t(self.sm_fir.tail_len),
            sm_q_tail=t(self.sm_fir.tail_len),
            trig=jnp.zeros(batch, jnp.int32),
            resid=jnp.zeros(batch, jnp.float32))

    @staticmethod
    def _rolled_table(table: jax.Array, start: jax.Array, n: int):
        """table[(start + j) % period] for j in [0, n) — the nominal carrier
        ramp is integer-periodic (period = 2*fs/gcd, <= ~720), so per-sample
        trig/angle sequences are a PERIOD-sized static table cycled from a
        carried phase: one dynamic_slice of a doubled table + tile + slice,
        all fusible — no length-n transcendental evaluation, no gather.
        Values are bit-identical to evaluating at every sample (the table
        holds the exact f32 per-phase values)."""
        per = table.shape[-1]
        doubled = jnp.concatenate([table, table], axis=-1)
        rolled = jax.lax.dynamic_slice_in_dim(
            doubled, start % per, per, axis=-1)
        reps = -(-n // per)
        return jnp.tile(rolled, reps)[..., :n]

    def __call__(self, x: jax.Array, carry: FFSyncCarry, p: PllParams = None):
        p = p or self.p
        n = x.shape[-1]
        i_sig, _ = self.i_fir(x, carry.in_tail)
        (q_sig,), in_tail = self._q_bank(x, carry.in_tail)

        # Rotate the analytic signal down by the exact nominal ramp evaluated
        # at the sample it currently describes: t = trig + k - m. cos/sin of
        # the ramp come from static period-length tables cycled by the
        # carried phase (bit-identical values, _rolled_table) — the old
        # per-sample cos+sin evaluation was half of the most expensive
        # elementwise fusion in the whole receiver graph.
        d_total = self.group_delay
        angle_tbl = p.trig_angle(jnp.arange(p.period, dtype=jnp.int32))
        ce = self._rolled_table(jnp.cos(angle_tbl),
                                carry.trig + 1 - self.hilbert_delay, n)
        se = self._rolled_table(jnp.sin(angle_tbl),
                                carry.trig + 1 - self.hilbert_delay, n)
        zr = i_sig * ce + q_sig * se
        zi = q_sig * ce - i_sig * se

        # two separate 2-D smoothing passes — NOT a stacked (..., 2, n) rail
        # batch: the stacked form's 3-D frame matrices picked transposing
        # layouts ({3,2,0,1} reshapes + pads, ~0.45 ms/run at mode 1,
        # 32ch x 12blk) while two half-size matmuls cost the same MXU time
        # with clean 2-D layouts (same lesson as CLAUDE.md's stacked-3-D
        # dead end, just milder)
        (zr,), sm_i_tail = self._sm_bank(zr, carry.sm_i_tail)
        (zi,), sm_q_tail = self._sm_bank(zi, carry.sm_q_tail)

        resid_w = jnp.arctan2(zi, zr)
        prev = jnp.concatenate([_wrap_pi(carry.resid)[..., None],
                                resid_w[..., :-1]], axis=-1)
        d = _wrap_pi(resid_w - prev)
        # unwrap: inclusive prefix sum of the wrapped deltas — via MXU
        # matmuls, NOT jnp.cumsum (whose reduce_window lowering was the
        # most expensive kernel in the whole receiver graph; ops/prefix.py)
        resid_u = carry.resid[..., None] + prefix_sum(d)

        # Consumer-visible phase: the locked reference loop's carrier sits at
        # the current sample's pilot phase (measured against ground truth),
        # so emit phi(k): nominal ramp exactly at trig + k, residual advanced
        # by its measured mean slope across the D-sample estimator lag.
        # Slope from the block's SECOND HALF only: a cold start (zero FIR
        # tails) corrupts the first ~(hilbert+smooth taps) deltas, and any
        # contamination of mu rotates the carrier for the whole block —
        # this keeps warm-up blocks (parallel.time_shard halos) convergent
        # and is the fresher estimate in steady state too.
        mu = jnp.mean(d[..., d.shape[-1] // 2:], axis=-1, keepdims=True)
        ramp_out = self._rolled_table(angle_tbl, carry.trig + 1, n)
        phase = ramp_out + resid_u + d_total * mu
        carrier = jnp.cos(p.nco_scale * phase + p.phase_adjust)

        new = FFSyncCarry(
            in_tail=in_tail, sm_i_tail=sm_i_tail, sm_q_tail=sm_q_tail,
            trig=(carry.trig + n) % p.period,
            resid=jnp.mod(resid_u[..., -1], _FOUR_PI))
        return carrier, new
