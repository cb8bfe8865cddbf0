"""Pallas TPU kernel: streaming FIR + decimation as a phase-plane tap loop.

This is the speed-of-light formulation of the reference's hot kernel
(``convolveFIR`` + decimation, src/filter.cpp:106-121) for TPU:

The framed-matmul form (ops/fir.py) is MXU-friendly but pays a J/T FLOP
waste that grows with the decimation factor (~13x at the front end's
down=10). This kernel instead decomposes the tail-prefixed input into
``down`` polyphase planes laid out with the streaming axis last
(lane-aligned), and accumulates the K taps as K unrolled VPU
multiply-adds of contiguous (C_tile, OUT_W) slices:

    y[c, n] = sum_k h[k] * P[c, p_k, n + joff_k]
    with (K-1-k) = joff_k * down + p_k

FLOPs are exactly n_out*K (optimal). The (K-1)/down-element halo each
output window needs is baked into the block layout on the host side with
pure reshape/slice/concat (Pallas BlockSpecs cannot express overlapping
blocks), so every kernel operand is a contiguous VMEM slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fir_decimate_planes", "plan_tiles"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(p_ref, o_ref, *, taps, joffs, planes, out_w):
    acc = None
    for k in range(len(taps)):
        sl = p_ref[:, 0, planes[k], joffs[k]:joffs[k] + out_w]
        term = taps[k] * sl
        acc = term if acc is None else acc + term
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("h", "down", "interpret"))
def fir_decimate_planes(xx: jax.Array, h: tuple, down: int,
                        interpret: bool = False):
    """Causal FIR + decimation on a tail-prefixed input.

    xx: (C, K-1+N) float32 — the input block prefixed with the carried tail
        (overlap-save state), with down | N and down | (K-1).
    h:  tuple of K float taps (static).
    Returns y: (C, N//down).
    """
    k_taps = len(h)
    c, total = xx.shape
    n = total - (k_taps - 1)
    assert n % down == 0 and (k_taps - 1) % down == 0, (n, k_taps, down)
    n_out = n // down
    j = total // down
    joff_max = (k_taps - 1) // down
    assert j == n_out + joff_max

    # polyphase planes, streaming axis last: P[c, p, j] = xx[c, j*down + p]
    planes_arr = xx.reshape(c, j, down).transpose(0, 2, 1)

    # Tiling: 512-lane output windows; input windows hold out_w + joff_max
    # useful lanes rounded up to the TPU's 128-lane granule. The channel tile
    # is the sublane granule (8) when possible.
    out_w = 512
    ct = 8 if c % 8 == 0 else 1
    nb = -(-n_out // out_w)
    w_in = _round_up(out_w + joff_max, 128)

    pad_to = nb * out_w + w_in
    planes_p = jnp.pad(planes_arr,
                       ((0, 0), (0, 0), (0, pad_to - planes_arr.shape[-1])))
    # window ni owns planes[..., ni*out_w : ni*out_w + w_in], built from
    # w_in/out_w... two shifted reshapes (no gathers)
    parts = []
    covered = 0
    while covered < w_in:
        seg = planes_p[..., covered: covered + nb * out_w]
        seg = seg.reshape(c, down, nb, out_w)
        take = min(out_w, w_in - covered)
        parts.append(seg[..., :take])
        covered += take
    p4 = jnp.concatenate(parts, axis=-1)          # (c, down, nb, w_in)
    p4 = p4.transpose(0, 2, 1, 3)                 # (c, nb, down, w_in)

    joffs = tuple(int((k_taps - 1 - k) // down) for k in range(k_taps))
    pks = tuple(int((k_taps - 1 - k) % down) for k in range(k_taps))

    kernel = functools.partial(_kernel, taps=tuple(float(t) for t in h),
                               joffs=joffs, planes=pks, out_w=out_w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, nb * out_w), xx.dtype),
        grid=(c // ct, nb),
        in_specs=[pl.BlockSpec(
            (ct, 1, down, w_in),
            lambda ci, ni: (ci, ni, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ct, out_w), lambda ci, ni: (ci, ni),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p4)
    return out[:, :n_out]
