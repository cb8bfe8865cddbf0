"""Mosaic epilogue for the static-tone folded channelizer (64 stations).

The fold matmul emits y (c, R*2S) f32 — frames on rows, (r-group, rail,
station) on lanes. The receivers consume station-major interleaved uint8
(S, 2*n_out). XLA lowers that epilogue (residual pos-rotation, quantize,
station-major transpose, i/q interleave) as a chain of full-HBM relayout
passes: the 2026-08-20 64-station trace charged it ~6.4 ms of the
14.6 ms/run (copy.192 f32 relayout 1.35, multiply_subtract 1.33,
quantize 0.6, two u8 relayouts 3.1). This kernel does the whole epilogue
in VMEM per c-tile:

- rotation partner (the other rail of each complex pair) is a 64-lane
  roll (2S == 128 lanes: +-S mod 2S is the same single rotation);
- per-lane rotation scalars are the (S,) residual tiled across rails
  with the subtract sign folded in (bit-identical algebra: (-1)*ps is
  exact, so y*pc + partner*(-ps) == vr*pc - vi*ps bit-for-bit);
- quantize to [0, 255] in f32, transpose (ct, 128) -> (128, ct) in VMEM,
  then pack the 4 stream bytes of each (station, frame, r-pair) into ONE
  int32 word (little-endian: [i(2rp), q(2rp), i(2rp+1), q(2rp+1)]) —
  Mosaic has no 8/16-bit minor-dim reshapes, 32-bit words sidestep it;
- words store as (R/2, S, c) planes; ONE XLA pass transposes to
  (S, c, R/2) and a free bitcast+reshape yields the uint8 stream.

Eligibility: 2S == 128 lanes (the 64-station north star), even R, c a
multiple of the 256-frame tile (models/channelizer.py pads the fold plan
to guarantee it). Agreement vs the XLA 4-D epilogue: the transpose,
packing and slicing are exact by construction; the rotation multiply-add
may contract to FMA differently across compilations, flipping
quantization boundaries by at most 1 u8 LSB (-48 dB; the compiled v5e
kernel matched the NumPy reference byte-for-byte, 2026-08-20). Pinned by
tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_TILE = 256  # frames per grid step (512 spilled registers on v5e)


def eligible(r_n: int, s_ch: int, c_pad: int) -> bool:
    return s_ch == 64 and r_n % 2 == 0 and c_pad % C_TILE == 0


def _kernel(y_ref, pc_ref, ps_ref, o_ref, *, r_half: int):
    y = y_ref[...]                              # (ct, R*2S) f32
    planes = []
    for rp in range(r_half):
        pair = []
        for h in (0, 1):
            yh = y[:, 256 * rp + 128 * h: 256 * rp + 128 * (h + 1)]
            partner = pltpu.roll(yh, 64, 1)
            zh = yh * pc_ref[...] + partner * ps_ref[...]
            uh = jnp.clip(jnp.round(128.0 + 127.0 * zh), 0., 255.)
            th = jax.lax.transpose(uh, (1, 0)).astype(jnp.int32)
            pair.append((th[:64], th[64:]))     # ((S, ct) i, (S, ct) q)
        (a0, b0), (a1, b1) = pair
        planes.append(a0 | (b0 << 8) | (a1 << 16) | (b1 << 24))
    o_ref[...] = jnp.stack(planes, axis=0)      # (R/2, S, ct)


@functools.partial(jax.jit, static_argnames=("r_n", "s_ch", "n_out",
                                             "interpret"))
def fold_epilogue_u8(y: jax.Array, pc: jax.Array, ps: jax.Array,
                     r_n: int, s_ch: int, n_out: int,
                     interpret: bool = False) -> jax.Array:
    """y (c_pad, r_n*2*s_ch) f32, pc/ps (s_ch,) residual rotation ->
    (s_ch, 2*n_out) interleaved uint8 station streams."""
    c_pad = y.shape[0]
    assert eligible(r_n, s_ch, c_pad), (r_n, s_ch, c_pad)
    sign = jnp.where(jnp.arange(128) < 64, -1.0, 1.0).astype(jnp.float32)
    pcl = jnp.tile(pc, (2,))[None]              # (1, 128)
    psl = (jnp.tile(ps, (2,)) * sign)[None]
    words = pl.pallas_call(
        functools.partial(_kernel, r_half=r_n // 2),
        grid=(c_pad // C_TILE,),
        in_specs=[
            pl.BlockSpec((C_TILE, r_n * 2 * s_ch), lambda ci: (ci, 0)),
            pl.BlockSpec((1, 128), lambda ci: (0, 0)),
            pl.BlockSpec((1, 128), lambda ci: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r_n // 2, s_ch, C_TILE),
                               lambda ci: (0, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((r_n // 2, s_ch, c_pad), jnp.int32),
        interpret=interpret,
    )(y, pcl, psl)
    # word -> byte extraction as shifts+stack rather than
    # bitcast_convert_type: XLA lowers the narrowing bitcast through a
    # u32[.., 4]-minor broadcast + and/convert passes (measured 7.0 vs
    # 4.7 ms for this conversion at the 64-station serving size,
    # 2026-08-20); in-kernel assembly is blocked by Mosaic's missing
    # 8/16-bit lane merges, so this XLA pass is the remaining epilogue
    # cost.
    # drop the zero-padded frames in WORD space first: the minor-dim
    # slice fuses into the elementwise extraction, where slicing the u8
    # result instead cost a separate 692 us full-HBM pass (2026-08-20);
    # at serving sizes (n_out % r_n == 0) the final byte slice is a no-op
    c_real = -(-n_out // r_n)
    words = words[:, :, :c_real]
    bs = [((words >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)]
    u8 = jnp.stack(bs, axis=-1).transpose(1, 2, 0, 3)   # (S, c, R/2, 4)
    return u8.reshape(s_ch, -1)[:, :2 * n_out]


def reference_u8(y: np.ndarray, pc: np.ndarray, ps: np.ndarray,
                 r_n: int, s_ch: int, n_out: int) -> np.ndarray:
    """NumPy twin of the XLA 4-D epilogue (models/channelizer.py) for
    byte-exactness tests."""
    c = y.shape[0]
    y4 = y.reshape(c, r_n, 2, s_ch)
    vr, vi = y4[:, :, 0, :], y4[:, :, 1, :]
    i_full = vr * pc - vi * ps
    q_full = vi * pc + vr * ps
    z = np.stack([i_full, q_full], axis=-1)
    u8 = np.clip(np.round(128.0 + 127.0 * z), 0, 255).astype(np.uint8)
    return u8.transpose(2, 0, 1, 3).reshape(s_ch, -1)[:, :2 * n_out]
