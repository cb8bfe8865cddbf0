"""FM discriminator: arctan-free quadrature derivative demodulator.

TPU-native twin of ``fmDemodNoArctan`` (reference: src/demod.cpp:3-24; Python
model ``fmDemod``, model/fmSupportLib.py:164-183):

    d[n] = (I[n]*(Q[n]-Q[n-1]) - Q[n]*(I[n]-I[n-1])) / (I[n]^2 + Q[n]^2)

with a zero-sample guard and the previous block's final (I, Q) carried as
state. Pure elementwise work — XLA fuses it into the surrounding graph.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fm_demod"]


def fm_demod(i_sig, q_sig, prev_i, prev_q):
    """Demodulate one block.

    i_sig, q_sig: (..., N); prev_i, prev_q: (...,) carried samples.
    Returns (demod (..., N), new_prev_i, new_prev_q).
    """
    di = jnp.diff(i_sig, axis=-1, prepend=prev_i[..., None])
    dq = jnp.diff(q_sig, axis=-1, prepend=prev_q[..., None])
    num = i_sig * dq - q_sig * di
    den = i_sig * i_sig + q_sig * q_sig
    zero = (i_sig == 0) & (q_sig == 0)
    out = jnp.where(zero, 0.0, num / jnp.where(den == 0, 1.0, den))
    return out, i_sig[..., -1], q_sig[..., -1]
