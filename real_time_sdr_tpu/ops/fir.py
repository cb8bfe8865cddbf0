"""Streaming FIR kernels: causal block convolution, decimation, and rational
polyphase resampling with overlap-save carried state.

TPU-native redesign of the reference's hot kernel pair
(``convolveFIR`` decimating overload, src/filter.cpp:106-121, and the fused
polyphase resampler, src/filter.cpp:123-147). Instead of scalar MAC loops the
block is expressed as dense tensor contractions with *compile-time-constant*
gather indices, so XLA lowers it to MXU/VPU-friendly fused ops:

  y[n] = sum_m  B[p_n, m] * xx[T-1 + q_n - m]

where ``p_n = (n*down) % up`` is the polyphase phase, ``q_n = n*down // up``
the input anchor, ``B`` the (up, T) zero-padded tap bank, and ``xx`` the block
prefixed with the carried tail. For ``up == down == 1`` this degenerates to a
plain causal FIR; for ``up == 1`` to the decimating front-end filter.

State contract: the carry holds the last ``T-1 = ceil(K/up)-1`` *input*
samples. (The reference stores K-1 samples; only the final T-1 are ever read
by its indexing, so the contracts are equivalent. For the long polyphase
audio banks the reference's state copy reads before the buffer start —
UB we do not replicate.)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PolyFIR", "state_len", "init_state"]


def state_len(num_taps: int, up: int = 1) -> int:
    """Carried input samples: ceil(num_taps/up) - 1."""
    return -(-num_taps // up) - 1


def init_state(num_taps: int, up: int = 1, batch: tuple = (),
               dtype=jnp.float32):
    return jnp.zeros(batch + (state_len(num_taps, up),), dtype)


class PolyFIR:
    """A designed FIR bound to static (up, down) resampling factors.

    Usage::

        f = PolyFIR(h, up=247, down=640)
        y, new_tail = f(x, tail)        # x: (..., N), tail: (..., T-1)

    The instance precomputes the phase bank and gather indices once per input
    length (cached), all as NumPy constants folded into the jitted graph.
    """

    def __init__(self, h: np.ndarray, up: int = 1, down: int = 1,
                 dtype=jnp.float32):
        h = np.asarray(h, dtype=np.float64)
        assert h.ndim == 1
        self.up = int(up)
        self.down = int(down)
        self.num_taps = K = h.shape[0]
        self.T = T = -(-K // up)  # input samples touched per output
        # Zero-padded polyphase bank: B[p, m] = h[p + up*m]
        bank = np.zeros((up, T), dtype=np.float64)
        for p in range(up):
            taps_p = h[p::up]
            bank[p, : taps_p.shape[0]] = taps_p
        self._bank = bank  # float64; cast to the block dtype at call time
        self._h = h
        self._plan_cache: dict[int, tuple] = {}

    @property
    def tail_len(self) -> int:
        return self.T - 1

    def _plan(self, n: int):
        """Constant index plan for an input block of n samples."""
        if n in self._plan_cache:
            return self._plan_cache[n]
        up, down, T = self.up, self.down, self.T
        n_out = (n * up) // down  # C++ truncation (src/filter.cpp:124)
        ns = np.arange(n_out, dtype=np.int64)
        phase = (ns * down) % up
        q = (ns * down) // up
        # frame f[n, m] = xx[T-1 + q_n - m]  ->  gather index (n_out, T)
        idx = (T - 1 + q[:, None] - np.arange(T)[None, :]).astype(np.int32)
        bank_rows = self._bank[phase]  # (n_out, T) constant
        plan = (n_out, idx, bank_rows)
        self._plan_cache[n] = plan
        return plan

    def __call__(self, x: jax.Array, tail: jax.Array):
        """Apply to one block. x: (..., N); tail: (..., T-1).

        Returns (y, new_tail) with y: (..., N*up//down)."""
        n = x.shape[-1]
        n_out, idx, bank_rows = self._plan(n)
        xx = jnp.concatenate([tail, x.astype(tail.dtype)], axis=-1)
        if self.up == 1 and self.T > 1:
            # Frames are plain strided windows; a strided conv keeps XLA on
            # its native convolution path (no gather materialization).
            y = _conv_decimate(xx, self._h.astype(x.dtype), self.down, n_out)
        else:
            frames = jnp.take(xx, jnp.asarray(idx), axis=-1)  # (..., n_out, T)
            y = jnp.einsum("...nt,nt->...n", frames,
                           jnp.asarray(bank_rows, dtype=frames.dtype),
                           precision=jax.lax.Precision.HIGHEST)
        new_tail = xx[..., xx.shape[-1] - self.tail_len:] if self.tail_len else xx[..., :0]
        return y, new_tail


@partial(jax.jit, static_argnames=("down", "n_out"))
def _conv_decimate(xx, h, down, n_out):
    """Causal FIR + decimation via lax strided convolution.

    y[n] = sum_k h[k] * xx[(K-1) + n*down - k]  for n < n_out.
    """
    lead = xx.shape[:-1]
    length = xx.shape[-1]
    lhs = xx.reshape((-1, 1, length))
    rhs = h[::-1].reshape((1, 1, h.shape[0]))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(down,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=lhs.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (-1,))[..., :n_out]
