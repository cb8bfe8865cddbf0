"""Pallas framed polyphase FIR: VMEM frame construction, zero HBM frames.

The XLA path (ops.fir.PolyFIR / shared_frames_apply) lowers each FIR stage
to frame-matrix construction + one MXU matmul, but the
``optimization_barrier`` that keeps XLA's fusion search tractable also
forces the frame matrix — J/stride times the input size — through HBM
twice (write + read). Measured on v5e this puts every tail stage at
~2-3x its minimum HBM traffic (BENCH_NOTES.md stage decomposition).

This kernel keeps the *identical* output math (same plan geometry, same
weight matrices, f32 HIGHEST accumulation) but builds the frames inside
VMEM from sublane-shifted row slices, so the only HBM traffic is one read
of the tail-prefixed input rows and one write of the outputs:

    rows   = xx.reshape(-1, stride)                  (HBM, read once)
    tile a = rows[f*tf : (f+1)*tf]                   (VMEM)
    part_s = concat(a[s:], next_rows[:s])[:, :]      (sublane shift, lane 0)
    frames = concat(parts, lanes)[:, :s_eff*stride]
    out    = frames @ W_padded                       (MXU, f32 HIGHEST)

All slices start at lane offset 0 (whole-row sublane shifts), the layout
Mosaic handles without the lane-offset concat bugs worked around in
frontend_fused.py. W is zero-padded from (J, nf*R) to
(s_eff*stride, Rp) — structural zeros cost MXU flops the memory-bound
stages have spare by >30x.

Supported geometry: ``stride % 128 == 0`` (true for every mode-0 stage and
all up=1 banks; mode 2's 147/800 audio bank falls back to the XLA path).
Reference twin: the decimating/resampling ``convolveFIR`` pair,
src/filter.cpp:106-147.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from real_time_sdr_tpu.ops.fir import PolyFIR

__all__ = ["FramedFIRBank", "pallas_supported"]

_HALO_ROWS = 8  # f32 sublane quantum; covers s_eff-1 <= 8 extra rows


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_supported(firs: list[PolyFIR]) -> bool:
    """True when this kernel can replace shared_frames_apply for ``firs``."""
    f0 = firs[0]
    if f0._single_tap:
        return False
    if any((f.up, f.down, f.num_taps) != (f0.up, f0.down, f0.num_taps)
           for f in firs):
        return False
    # probe geometry at a nominal length: stride/lane alignment is a
    # property of (up, down, target_frame) only
    n_probe = 16 * f0.down
    _, R, stride, J, _, _, s_over, _ = f0._plan(n_probe)
    return stride % 128 == 0 and s_over <= _HALO_ROWS + 1


def _kernel(a_ref, b_ref, w_ref, o_ref, *, s_eff):
    a = a_ref[:]                              # (tf, stride) f32
    parts = [a]
    for s in range(1, s_eff):
        parts.append(jnp.concatenate([a[s:], b_ref[:s]], axis=0))
    frames = jnp.concatenate(parts, axis=-1)  # (tf, s_eff*stride)
    o_ref[:] = jnp.dot(frames, w_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


class FramedFIRBank:
    """n same-geometry FIRs applied to one input, frames built in VMEM.

    Drop-in for ``ops.fir.shared_frames_apply`` (and for a single PolyFIR
    when ``len(firs) == 1``): identical state contract (the carried tail is
    the shared input history), identical outputs to f32 reduction order.

        bank = FramedFIRBank([pilot_fir, band_fir, rds_fir])
        (pilot, band, rds), new_tail = bank(x, tail)
    """

    def __init__(self, firs: list[PolyFIR], interpret: bool = False):
        assert pallas_supported(firs), "geometry unsupported; use XLA path"
        self.firs = firs
        self.interpret = bool(interpret)
        self._plan_cache: dict[int, tuple] = {}

    @property
    def tail_len(self) -> int:
        return self.firs[0].tail_len

    def _plan(self, n: int):
        if n in self._plan_cache:
            return self._plan_cache[n]
        f0 = self.firs[0]
        n_out, R, stride, J, _, c_frames, s_over, _ = f0._plan(n)
        nf = len(self.firs)
        w_cat = np.concatenate([f._plan(n)[4] for f in self.firs], axis=1)
        s_eff = s_over
        jp = s_eff * stride
        rp = _round_up(nf * R, 128)
        w_pad = np.zeros((jp, rp), dtype=np.float32)
        w_pad[:J, :nf * R] = w_cat
        tf = 128 if c_frames >= 128 else _round_up(c_frames, 8)
        nbf = -(-c_frames // tf)
        rows_total = nbf * tf + _HALO_ROWS
        plan = (n_out, R, stride, s_eff, w_pad, tf, nbf, rows_total, rp)
        self._plan_cache[n] = plan
        return plan

    def cost(self, n: int) -> dict:
        """Speed-of-light accounting (see PolyFIR.cost)."""
        n_out, R, stride, s_eff, w_pad, tf, nbf, rows_total, rp = \
            self._plan(n)
        nf = len(self.firs)
        flops = 2 * (nbf * tf) * w_pad.shape[0] * rp
        byts = (4 * rows_total * stride      # input rows, read once
                + 4 * w_pad.size             # resident weights
                + 4 * nf * n_out)            # outputs
        return {"kind": "fir_pallas_f32", "flops": flops, "bytes": byts,
                "dims": (nbf * tf, w_pad.shape[0], rp)}

    def __call__(self, x: jax.Array, tail: jax.Array):
        n = x.shape[-1]
        n_out, R, stride, s_eff, w_pad, tf, nbf, rows_total, rp = \
            self._plan(n)
        nf = len(self.firs)
        from real_time_sdr_tpu.ops.fir import barrier
        xx = jnp.concatenate([tail, x.astype(tail.dtype)], axis=-1)
        xx = barrier(xx, "polyfir")  # tagged: RTSDR_NO_BARRIER A/B-able
        new_tail = (xx[..., xx.shape[-1] - self.tail_len:]
                    if self.tail_len else xx[..., :0])
        pad = rows_total * stride - xx.shape[-1]
        xp = jnp.pad(xx, [(0, 0)] * (xx.ndim - 1) + [(0, pad)])
        rows = xp.reshape(xp.shape[:-1] + (rows_total, stride))

        batch = x.shape[:-1]
        tf_halo = tf // _HALO_ROWS
        kern = functools.partial(_kernel, s_eff=s_eff)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nbf * tf, rp), jnp.float32),
            grid=(nbf,),
            in_specs=[
                pl.BlockSpec((tf, stride), lambda fi: (fi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_HALO_ROWS, stride),
                             lambda fi, _t=tf_halo: ((fi + 1) * _t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w_pad.shape, lambda fi: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tf, rp), lambda fi: (fi, 0),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )
        fn = call
        for _ in batch:
            fn = jax.vmap(fn, in_axes=(0, 0, None))
        y = fn(rows, rows, jnp.asarray(w_pad))   # (..., nbf*tf, rp)
        outs = []
        for i in range(nf):
            yi = y[..., i * R:(i + 1) * R]
            outs.append(yi.reshape(yi.shape[:-2] + (-1,))[..., :n_out])
        return outs, new_tail
