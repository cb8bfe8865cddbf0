"""Fused Pallas TPU front end: raw interleaved uint8 IQ -> FM discriminator.

One kernel replaces the reference's whole frontend thread body
(src/rffrontend.cpp:45-74: deinterleave+normalize, two decimating FIRs,
fmDemodNoArctan) *and* the HBM round trips between those stages. The XLA
path (ops.fir.DualPhaseFIR + ops.demod.fm_demod) materializes the bf16
frame matrix and the decimated I/Q streams in HBM; here the raw bytes are
read once, frames are built in VMEM from two sublane-shifted slices, the
dual-phase banded weight matrix runs as two bf16 MXU passes (hi+lo split
taps, exact for 8-bit data), and the discriminator epilogue runs on the
matmul result in registers — the only HBM write is the demodulated IF
signal (0.4 bytes out per input byte at mode 0).

Geometry (per grid step = one tile of ``tf`` frames):

    frame f covers outputs m = f*g + r, r in [0, g), g = 64
    I[m] = sum_k h[k] * s[2(m*down - k)]     (s = tail-prefixed stream)
    window_f = xs[f*stride : f*stride + Jp],  stride = g*2*down
    W[r*2*down + 2K-2-2k, r] = h[k]/128;  W[.+1, g+r] = h[k]/128

``stride`` is a multiple of 128 for every mode (g*2*down with even 2*down),
so all window slices are lane-aligned. The uint8->float normalization
(x-128)/128 (src/rffrontend.cpp:60) costs nothing: the staging keeps raw
bytes (one concat+pad copy, then a FREE u8->i8 bitcast reinterpret), the
kernel applies ``v ^ 0x80 == x - 128`` as one vector int8 xor, the /128
folds into the weights, and int8 values are exact in bfloat16.

The demodulator needs each output's predecessor. In-frame predecessors are
a lane shift; across frames within a tile, the previous frame's last
column is extracted by a selector matmul (lane offset 0 — Mosaic cannot
sublane-concat a lane-offset slice) and sublane-shifted; only each TILE's
first frame takes an external boundary value, computed host-side as nbf
tiny dots over boundary byte windows (a per-TILE, not per-frame, cost —
there is still no sequential carry between grid steps, so vmap batching
and grid parallelism survive).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from real_time_sdr_tpu.ops.fir import barrier
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedFrontendFIR"]

_G = 64  # outputs per frame: 2*G = one 128-lane column block (I | Q)
# A/B hook: split-matmul frame form (see _kernel). Measured on v5e.
_SPLIT = os.environ.get("RTSDR_FRONTEND_SPLIT", "0") == "1"
# A/B hook: int8x2 split-tap matmuls (int8 frames x int8 weight limbs ->
# int32, scales folded in f32 on the small output). The MXU rate is the
# same as bf16 (measured 2026-08-20, BENCH_NOTES int8 probe) — the win
# is skipping the int8->bf16 FRAME cast, the largest VPU cost per grid
# step (the frame buffer is 12x the output). Tap precision drops from
# the exact bf16-hi+lo split to a 15-bit integer split (~90 dB — above
# every chain gate but not bit-identical), hence opt-in until measured.
# MEASURED (CPU interpret): ~56 dB after the discriminator — BELOW the
# 60 dB chain gate; stays opt-in, kept only as a future wide-N pairing.
_INT8 = os.environ.get("RTSDR_FRONTEND_INT8", "0") == "1"
# WIDE form: hi|lo limbs as columns of ONE (jp, 4g) matmul (N=256, two
# lane tiles streaming through the MXU) instead of two N=128 passes —
# bit-identical math (see _kernel). RTSDR_FRONTEND_WIDE=0 restores the
# two-pass form.
_WIDE = os.environ.get("RTSDR_FRONTEND_WIDE", "1") == "1"
# BANDED form: split the g outputs into 32-wide r-groups; each group's
# window only spans (31*dprime + 2K) rows of the jp-lane frame, so its
# matmul is (tf, span)x(span, 128) with cols [I_hi|Q_hi|I_lo|Q_lo] — a
# FULL output tile per group at a fraction of the K dim (mode 0: 896 vs
# 1536 rows, 1.7x fewer MACs; the banded weight matrix is mostly zeros
# outside each group's span). hi+lo recombine via two 0/1 selector dots
# (exact f32 adds). Eligible when 32*dprime is lane-aligned (modes
# 0/1/2; mode 3's dprime=6 is not) — falls back to wide otherwise.
# ulp-equivalent to wide (same addends, shorter zero-padded sums).
_BAND = os.environ.get("RTSDR_FRONTEND_BAND", "0") == "1"
# predecessor extraction: lane ROLL (default; exact, no MXU) vs the old
# f32-HIGHEST selector matmuls (RTSDR_FRONTEND_PRED=dot restores)
_PRED_ROLL = os.environ.get("RTSDR_FRONTEND_PRED", "roll") != "dot"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(a_ref, b_ref, whi_ref, wlo_ref, pi_ref, pq_ref, o_ref, *,
            tf, g, stride, jp, s_over, int8_scales=None, wide=False,
            band=None):
    a = a_ref[:]                      # (tf, stride) int8 = raw bytes,
    b = b_ref[:]                      # (32, stride)   bit-reinterpreted
    # Normalize IN-KERNEL: the operand is the raw byte x reinterpreted as
    # int8, and (x ^ 0x80) as int8 == x - 128 in two's complement — one
    # vector xor, then an exact int8->bf16 cast. Doing it here instead of
    # the old host-side xor+bitcast+pad staging chain removes two full HBM
    # passes over the raw stream (measured ~240 us/run at 32ch x 12blk —
    # the staging copies cost more than the matmuls). Mosaic cannot cast
    # uint8 (and v5e rejects bf16 compares), hence the int8 xor trick.
    #
    # SPLIT-MATMUL frame form: instead of lane-concatenating the s_over
    # window parts into one (tf, jp) buffer and multiplying once, each
    # part multiplies against its own row-slice of the weight matrix and
    # the partial products accumulate in f32 — same FLOPs, no wide concat
    # buffer (lane concats at non-128 offsets are VPU-expensive).
    if _SPLIT:
        fa = (a ^ jnp.int8(-128)).astype(jnp.bfloat16)
        y = (jnp.dot(fa, whi_ref[:stride, :],
                     preferred_element_type=jnp.float32)
             + jnp.dot(fa, wlo_ref[:stride, :],
                       preferred_element_type=jnp.float32))
        for s in range(1, s_over):
            rows_s = jnp.concatenate([a[s:], b[:s]], axis=0)
            take = min(stride, jp - s * stride)
            fs_ = (rows_s[:, :take] ^ jnp.int8(-128)).astype(jnp.bfloat16)
            off = s * stride
            y = (y + jnp.dot(fs_, whi_ref[off:off + take, :],
                             preferred_element_type=jnp.float32)
                 + jnp.dot(fs_, wlo_ref[off:off + take, :],
                           preferred_element_type=jnp.float32))
    else:
        parts = [a]
        for s in range(1, s_over):
            rows_s = jnp.concatenate([a[s:], b[:s]], axis=0)
            take = min(stride, jp - s * stride)
            parts.append(rows_s[:, :take])
        v = jnp.concatenate(parts, axis=-1)
        if int8_scales is not None:
            # int8x2: frames stay int8 (xor only — no frame-sized cast);
            # exact int8 x int8 -> int32 MXU passes, the 15-bit integer
            # tap split recombined in f32 on the (tf, 2g) output (both
            # partial sums are < 2^24, so the int32->f32 casts are
            # exact; see _INT8)
            c1, c2 = int8_scales
            vx = v ^ jnp.int8(-128)
            if wide:
                yw = jnp.dot(vx, whi_ref[:],
                             preferred_element_type=jnp.int32)
                y1, y2 = yw[:, :2 * g], yw[:, 2 * g:]
            else:
                y1 = jnp.dot(vx, whi_ref[:],
                             preferred_element_type=jnp.int32)
                y2 = jnp.dot(vx, wlo_ref[:],
                             preferred_element_type=jnp.int32)
            y = (y1.astype(jnp.float32) * c1
                 + y2.astype(jnp.float32) * c2)
        elif band is not None:
            # BANDED form (see _BAND): per 32-output group, one
            # (tf, span_pad) x (span_pad, 128) full-tile matmul over just
            # that group's window rows, then hi+lo recombine through two
            # 0/1 selector dots (exact f32 adds; offset-0 outputs so the
            # cross-group lane concats are legal)
            n_groups, span_pad, g_s = band
            frames = (v ^ jnp.int8(-128)).astype(jnp.bfloat16)
            rowv = jax.lax.broadcasted_iota(jnp.int32, (128, g_s), 0)
            colv = jax.lax.broadcasted_iota(jnp.int32, (128, g_s), 1)
            s_i = ((rowv == colv)
                   | (rowv == colv + 2 * g_s)).astype(jnp.float32)
            s_q = ((rowv == colv + g_s)
                   | (rowv == colv + 3 * g_s)).astype(jnp.float32)
            i_parts, q_parts = [], []
            for s2 in range(n_groups):
                off = s2 * g_s * (stride // g)   # = s2*g_s*dprime lanes
                fr_s = frames[:, off:off + span_pad]
                y_g = jnp.dot(
                    fr_s,
                    whi_ref[s2 * span_pad:(s2 + 1) * span_pad, :],
                    preferred_element_type=jnp.float32)
                i_parts.append(jnp.dot(
                    y_g, s_i, precision=jax.lax.Precision.HIGHEST))
                q_parts.append(jnp.dot(
                    y_g, s_q, precision=jax.lax.Precision.HIGHEST))
            y = jnp.concatenate(
                [jnp.concatenate(i_parts, axis=-1),
                 jnp.concatenate(q_parts, axis=-1)], axis=-1)
        elif wide:
            # WIDE form: hi and lo limbs as columns of ONE (jp, 4g)
            # matmul — N doubles to 256 (two lane tiles streaming
            # through the MXU instead of two separate N=128 passes),
            # identical math bit-for-bit (each output column's dot is
            # independent; the limb add is the same f32 add)
            frames = (v ^ jnp.int8(-128)).astype(jnp.bfloat16)
            yw = jnp.dot(frames, whi_ref[:],
                         preferred_element_type=jnp.float32)
            y = yw[:, :2 * g] + yw[:, 2 * g:]
        else:
            frames = (v ^ jnp.int8(-128)).astype(jnp.bfloat16)
            y = (jnp.dot(frames, whi_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(frames, wlo_ref[:],
                           preferred_element_type=jnp.float32))
    i_sig, q_sig = y[:, :g], y[:, g:2 * g]
    # predecessor of in-frame column r is column r-1; column 0's
    # predecessor is the previous FRAME's last column — a sublane shift of
    # column g-1, with the tile's first frame seeded from the precomputed
    # per-tile boundary sample (pi/pq, (1, 1))
    fi = pl.program_id(0)
    pv_i = pi_ref[pl.dslice(fi, 1), :]     # (1, 1) from the (nbf, 1) table
    pv_q = pq_ref[pl.dslice(fi, 1), :]
    # last column moved to lane offset 0: a lane-offset-63 slice cannot be
    # sublane-concatenated with an offset-0 vector (Mosaic: "offset
    # mismatch on non-concat dimension"), but a LANE ROTATE by +1 lands
    # column g-1 at offset 0 (and is exact data movement). This replaced
    # two (tf, 2g) x (2g, 1) f32-HIGHEST selector matmuls — each an
    # N-padded multi-pass MXU dispatch that rivaled the main banded
    # matmul's lane budget. Measured (v5e 32x12, 2026-08-20): ~+1% on
    # every mode (mode 0 98.0 -> 99.4% of floor), bit-identical outputs.
    if _PRED_ROLL:
        # two rolls so BOTH predecessors land at lane offset 0 (a single
        # roll leaves one of them at offset g, un-concatenable):
        # roll(+1)[0] = y[2g-1] = last Q; roll(+g+1)[0] = y[g-1] = last I
        last_q = pltpu.roll(y, 1, 1)[:, 0:1]
        last_i = pltpu.roll(y, g + 1, 1)[:, 0:1]
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (2 * g, 1), 0)
        sel_i = (row == g - 1).astype(jnp.float32)
        sel_q = (row == 2 * g - 1).astype(jnp.float32)
        # HIGHEST pins the f32 contraction (TPU default would bf16-round
        # the predecessor, an error comb at if_fs/g in the demod)
        last_i = jnp.dot(y, sel_i, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        last_q = jnp.dot(y, sel_q, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    ip0 = jnp.concatenate([pv_i, last_i[:-1]], axis=0)
    qp0 = jnp.concatenate([pv_q, last_q[:-1]], axis=0)
    ip = jnp.concatenate([ip0, i_sig[:, :g - 1]], axis=-1)
    qp = jnp.concatenate([qp0, q_sig[:, :g - 1]], axis=-1)
    num = i_sig * (q_sig - qp) - q_sig * (i_sig - ip)
    den = i_sig * i_sig + q_sig * q_sig
    zero = (i_sig == 0.0) & (q_sig == 0.0)
    o_ref[:] = jnp.where(zero, 0.0, num / jnp.where(den == 0.0, 1.0, den))


class FusedFrontendFIR:
    """Pallas twin of ops.fir.DualPhaseFIR + ops.demod.fm_demod.

    Same state contract as the XLA pair: a (2K-2,) raw uint8 interleaved
    tail plus the carried (prev_i, prev_q) discriminator samples
    (src/demod.cpp:21-22). Call maps (..., 2N) uint8 -> (..., N//down) f32
    demod plus the new state triple.
    """

    def __init__(self, h: np.ndarray, down: int, interpret: bool = False):
        h = np.asarray(h, dtype=np.float64)
        assert h.ndim == 1
        self.num_taps = K = h.shape[0]
        self.down = int(down)
        self.interpret = bool(interpret)
        self._h = h
        self.dprime = 2 * self.down
        self.g = int(os.environ.get("RTSDR_FRONTEND_G", str(_G)))
        self.stride = self.g * self.dprime
        assert self.stride % 128 == 0, (down, self.stride)
        j_used = (self.g - 1) * self.dprime + 2 * K
        self.jp = _round_up(j_used, 128)
        self.s_over = -(-self.jp // self.stride)
        # banded dual-phase weights with /128 normalization folded in,
        # split hi+lo bf16 (exact for int8 data, full f32 tap precision)
        w = np.zeros((self.jp, 2 * self.g), dtype=np.float64)
        for r in range(self.g):
            for k in range(K):
                j = r * self.dprime + 2 * K - 2 - 2 * k
                w[j, r] = h[k]
                w[j + 1, self.g + r] = h[k]
        ws = (w / 128.0).astype(np.float32)
        self._w_hi = ws.astype(jnp.bfloat16)
        self._w_lo = (ws - np.asarray(self._w_hi, np.float32)).astype(
            jnp.bfloat16)
        # int8x2 limbs (RTSDR_FRONTEND_INT8): W15 = round(ws * 2^e) with
        # |W15| < 2^14, split W15 = hi*128 + lo; both limbs int8, both
        # partial dot sums exactly representable in f32 (see _kernel)
        e = int(np.floor(np.log2((2 ** 14 - 1) / np.abs(ws).max())))
        w15 = np.round(ws * float(2 ** e)).astype(np.int32)
        q_hi = np.floor_divide(w15, 128)
        q_lo = w15 - q_hi * 128
        assert q_hi.min() >= -128 and q_hi.max() <= 127
        self._wq_hi = q_hi.astype(np.int8)
        self._wq_lo = q_lo.astype(np.int8)
        self._wq_scales = (float(128.0 / 2 ** e), float(1.0 / 2 ** e))
        # boundary-sample window weights: (2K, 2) f32, /128 folded
        v = np.zeros((2 * K, 2), dtype=np.float64)
        for k in range(K):
            v[2 * K - 2 - 2 * k, 0] = h[k]
            v[2 * K - 1 - 2 * k, 1] = h[k]
        self._v = (v / 128.0).astype(np.float32)
        self._plan_cache: dict[int, tuple] = {}

    @property
    def tail_len(self) -> int:
        return 2 * self.num_taps - 2

    def _band_plan(self):
        """(n_groups, span_pad, g_s, W_band) for the BANDED kernel form,
        or None when the geometry is ineligible (see _BAND). W_band is
        (n_groups*span_pad, 128) bf16: group s rows are the frame-window
        slice [s*g_s*dprime, +span_pad) of the full weight matrix,
        columns [I_hi | Q_hi | I_lo | Q_lo] for outputs r in
        [s*g_s, (s+1)*g_s)."""
        cached = getattr(self, "_band_cache", False)
        if cached is not False:
            return cached
        g_s = 32
        n_groups = self.g // g_s
        eligible = (self.g % g_s == 0 and n_groups >= 2
                    and (g_s * self.dprime) % 128 == 0)
        if not eligible:
            self._band_cache = None
            return None
        span = (g_s - 1) * self.dprime + 2 * self.num_taps
        span_pad = _round_up(span, 128)
        assert (n_groups - 1) * g_s * self.dprime + span_pad <= self.jp
        w_hi = np.asarray(self._w_hi)
        w_lo = np.asarray(self._w_lo)
        wb = np.zeros((n_groups * span_pad, 4 * g_s), dtype=w_hi.dtype)
        for s in range(n_groups):
            r0 = s * g_s
            rows = slice(s * g_s * self.dprime,
                         s * g_s * self.dprime + span_pad)
            wb[s * span_pad:(s + 1) * span_pad, 0:g_s] = \
                w_hi[rows, r0:r0 + g_s]
            wb[s * span_pad:(s + 1) * span_pad, g_s:2 * g_s] = \
                w_hi[rows, self.g + r0:self.g + r0 + g_s]
            wb[s * span_pad:(s + 1) * span_pad, 2 * g_s:3 * g_s] = \
                w_lo[rows, r0:r0 + g_s]
            wb[s * span_pad:(s + 1) * span_pad, 3 * g_s:4 * g_s] = \
                w_lo[rows, self.g + r0:self.g + r0 + g_s]
        self._band_cache = (n_groups, span_pad, g_s, wb)
        return self._band_cache

    def _plan(self, n2: int):
        if n2 in self._plan_cache:
            return self._plan_cache[n2]
        assert n2 % self.dprime == 0, (n2, self.dprime)
        n_out = (n2 // 2) // self.down
        c_frames = -(-n_out // self.g)
        # tile height: flat 512 cap. Under the wide-N (jp, 4g) matmul the
        # per-tile fixed cost (window DMA setup + grid step) dominates the
        # old work-balance heuristic: the round-5 v5e sweep measured
        # tf=512 best at EVERY mode (mode 0: 128->9.36k, 256->9.62k,
        # 512->9.76k, 1024/1408->8.75-9.04k; mode 2 +6%, mode 1 +2%,
        # mode 3 +1% — BENCH_NOTES 2026-08-21). The pre-wide heuristic
        # (tf*jp ~ 128*1536) is retired with the two-pass form it tuned.
        tf_env = os.environ.get("RTSDR_FRONTEND_TF")
        tf_cap = int(tf_env) if tf_env else 512
        tf = tf_cap if c_frames >= tf_cap else _round_up(c_frames, 32)
        nbf = -(-c_frames // tf)
        rows_total = nbf * tf + 32
        plan = (n_out, c_frames, tf, nbf, rows_total)
        self._plan_cache[n2] = plan
        return plan

    def cost(self, n2: int) -> dict:
        """Speed-of-light accounting (see PolyFIR.cost); n2 = interleaved."""
        n_out, c_frames, tf, nbf, rows_total = self._plan(n2)
        flops = 2 * 2 * (nbf * tf) * self.jp * 2 * self.g  # hi+lo passes
        byts = (1 * rows_total * self.stride   # int8 rows (single HBM read)
                + 2 * 2 * self.jp * 2 * self.g  # resident bf16 weights
                + 4 * n_out)                    # fused demod out
        return {"kind": "fused_u8_bf16x2", "flops": flops, "bytes": byts,
                "w_bytes": 2 * 2 * self.jp * 2 * self.g,
                "dims": (nbf * tf, self.jp, 2 * self.g)}

    def _flat_window(self, rows2: jax.Array, off: int, ln: int):
        """``flat[off:off+ln]`` read from the (..., rows_total, stride)
        ROWS operand via at most two static row slices + concat.

        NEVER slice the flat ``reshape`` of the rows operand instead: the
        1-D and 2-D int8 tilings differ, so ANY consumer of the flat view
        makes XLA relayout-copy the WHOLE staged operand (59 MB,
        ~85 us/run at mode-0 32x12 — HLO copy.113, the largest single
        relayout in the round-5 trace) just to serve a 400-byte window."""
        r0, c0 = divmod(int(off), self.stride)
        if c0 + ln <= self.stride:
            return jax.lax.slice_in_dim(
                rows2[..., r0, :], c0, c0 + ln, axis=-1)
        head = jax.lax.slice_in_dim(rows2[..., r0, :], c0, self.stride,
                                    axis=-1)
        rest = ln - (self.stride - c0)
        tail = jax.lax.slice_in_dim(rows2[..., r0 + 1, :], 0, rest,
                                    axis=-1)
        return jnp.concatenate([head, tail], axis=-1)

    def _window_dots(self, w: jax.Array) -> jax.Array:
        """Raw int8-reinterpreted byte windows (..., f, k2) -> decimated
        (I, Q) pairs (..., f, 2). The sign-select is the int8-reinterpret
        normalization (see _kernel)."""
        w = w.astype(jnp.float32)
        w = jnp.where(w >= 0, w - 128.0, w + 128.0)
        return jnp.einsum("...fj,jr->...fr", w, jnp.asarray(self._v),
                          precision=jax.lax.Precision.HIGHEST)

    def _boundary_dots(self, xf: jax.Array, ms) -> jax.Array:
        """Decimated (I[m], Q[m]) for output indices ``ms`` via tiny dots
        over the raw byte windows — (..., len(ms), 2).

        xf: (..., padded L) raw bytes reinterpreted as int8. STATIC slices,
        not a gather: jnp.take with per-channel-equal indices made XLA's
        layout assignment flip the whole staging chain to a channel-minor
        layout (three transposing copies of the 40+ MB stream on mode 1 —
        measured)."""
        k2 = 2 * self.num_taps
        w = jnp.stack(
            [jax.lax.slice_in_dim(xf, int(2 * m * self.down),
                                  int(2 * m * self.down) + k2, axis=-1)
             for m in ms], axis=-2)
        return self._window_dots(w)

    def _boundary_dots_rows(self, rows2: jax.Array, ms) -> jax.Array:
        """Rows-form twin of ``_boundary_dots`` (see _flat_window)."""
        k2 = 2 * self.num_taps
        w = jnp.stack([self._flat_window(rows2, 2 * m * self.down, k2)
                       for m in ms], axis=-2)
        return self._window_dots(w)

    def _boundary_sample(self, xf: jax.Array, m: int):
        """Decimated (I[m], Q[m]) — the carried discriminator state."""
        return self._boundary_dots(xf, [m])[..., 0, :]

    def staged_len(self, n2: int) -> int:
        """Padded byte length of a HOST-staged operand for an n2-byte
        segment: [tail (2K-2) | segment (n2) | 0x80 pad]."""
        return self._plan(n2)[4] * self.stride

    def stage_segment(self, prev_tail_u8, seg_u8, out=None,
                      rows: bool = False):
        """HOST-side staging (numpy): build the padded operand so the
        device-side concat+pad passes (~290 us/run at mode-0 32x12, the
        last named flagship overhead — BENCH_NOTES) never run. Supports
        leading batch dims; pass ``out`` to reuse a preallocated buffer.

        ``rows=True`` additionally returns the operand as the
        (..., rows_total, stride) INT8 view the kernel dispatch consumes
        — a free host-side reshape+view that removes the LAST device-side
        prep too: uploading the flat u8 form costs a u8->i8
        bitcast_convert kernel (~80 us/run at mode-0 32x12) plus a
        re-tiling copy of the reshape to rows (~85 us) because the 1-D
        and 2-D tilings differ; the pre-shaped upload lands directly in
        the layout the Mosaic call wants."""
        prev_tail_u8 = np.asarray(prev_tail_u8, dtype=np.uint8)
        seg_u8 = np.asarray(seg_u8, dtype=np.uint8)
        n2 = seg_u8.shape[-1]
        tl = self.tail_len
        shape = seg_u8.shape[:-1] + (self.staged_len(n2),)
        if out is None:
            out = np.empty(shape, dtype=np.uint8)
        assert out.shape == shape
        out[..., :tl] = prev_tail_u8
        out[..., tl:tl + n2] = seg_u8
        out[..., tl + n2:] = 128
        if rows:
            rows_total = self._plan(n2)[4]
            return (out.view(np.int8)
                    .reshape(shape[:-1] + (rows_total, self.stride)))
        return out

    def stage_segment_full(self, prev_tail_u8, seg_u8, out=None):
        """ROWS-form staging PLUS the small auxiliary operands: returns
        ``(rows, bnd, tail)`` where ``bnd`` (..., nbf, 2K) int8 holds the
        raw boundary byte windows (the nbf-1 inter-tile predecessors and
        the final n_out-1 sample window) and ``tail`` (..., 2K-2) uint8
        is the next segment's tail bytes.

        Why: with the big operand consumed ONLY by the Mosaic kernel, XLA
        leaves it in the uploaded layout. Any other consumer — even a
        400-byte slice for a boundary window or the tail — makes layout
        assignment relayout-copy the ENTIRE 59 MB operand (HLO copy.113/
        copy.169, ~85 us/run at mode-0 32x12: the largest single
        relayout in the round-5 trace). The windows are views of bytes
        the host just wrote, so staging them separately costs ~nothing
        and the device math on them is unchanged (bit-exact vs the
        unstaged path)."""
        staged = self.stage_segment(prev_tail_u8, seg_u8, out=out)
        n2 = np.asarray(seg_u8).shape[-1]
        n_out, c_frames, tf, nbf, rows_total = self._plan(n2)
        k2 = 2 * self.num_taps
        ms = [int(m * tf * self.g - 1) for m in range(1, nbf)] \
            + [n_out - 1]
        bnd = np.stack([staged[..., 2 * m * self.down:
                               2 * m * self.down + k2] for m in ms],
                       axis=-2).view(np.int8)
        tail = staged[..., n2:n2 + self.tail_len]
        rows2 = (staged.view(np.int8)
                 .reshape(staged.shape[:-1] + (rows_total, self.stride)))
        return rows2, np.ascontiguousarray(bnd), np.ascontiguousarray(tail)

    def call_staged(self, xp_u8: jax.Array, n2: int,
                    prev_i: jax.Array, prev_q: jax.Array, aux=None):
        """xp_u8: host-staged operand (stage_segment) — either the flat
        (..., staged_len(n2)) uint8 form or the pre-shaped
        (..., rows_total, stride) int8 rows form (``rows=True`` /
        ``stage_segment_full``).

        ``aux``: the (bnd, tail) small operands from
        ``stage_segment_full`` — with them the Mosaic kernel is the ONLY
        consumer of the big rows operand, so XLA never relayout-copies it
        (see stage_segment_full). Same results as ``__call__``
        bit-for-bit in every form (the boundary dots run the identical
        device einsum on the identical bytes)."""
        rows_total = self._plan(n2)[4]
        if xp_u8.dtype == jnp.int8:
            assert xp_u8.shape[-2:] == (rows_total, self.stride), \
                (xp_u8.shape, rows_total, self.stride)
            rows = barrier(xp_u8, "frontend")
            if aux is not None:
                bnd_w, tail_b = aux
                demod, new_prev = self._dispatch_rows(
                    rows, None, n2, prev_i, prev_q, bnd_windows=bnd_w)
                return (demod, tail_b, new_prev[..., 0], new_prev[..., 1])
            # tail as uint8 (the state contract): tiny ROWS-form window
            # (slicing a flat reshape instead would relayout-copy the
            # whole operand — see _flat_window)
            new_tail = jax.lax.bitcast_convert_type(
                self._flat_window(rows, n2, self.tail_len), jnp.uint8)
            demod, new_prev = self._dispatch_rows(rows, None, n2,
                                                  prev_i, prev_q)
            return demod, new_tail, new_prev[..., 0], new_prev[..., 1]
        new_tail = xp_u8[..., n2:n2 + self.tail_len]
        xf = jax.lax.bitcast_convert_type(barrier(xp_u8, "frontend"),
                                          jnp.int8)
        demod, new_prev = self._dispatch(xf, n2, prev_i, prev_q)
        return demod, new_tail, new_prev[..., 0], new_prev[..., 1]

    def __call__(self, s_u8: jax.Array, tail_u8: jax.Array,
                 prev_i: jax.Array, prev_q: jax.Array):
        """s_u8: (..., 2N) raw interleaved uint8; tail_u8: (..., 2K-2).

        Returns (demod (..., N//down) f32, new_tail, new_prev_i, new_prev_q).
        """
        n2 = s_u8.shape[-1]
        n_out, c_frames, tf, nbf, rows_total = self._plan(n2)
        xx = jnp.concatenate([tail_u8, s_u8], axis=-1)
        xx = barrier(xx, "frontend")  # tagged: RTSDR_NO_BARRIER A/B-able
        new_tail = xx[..., xx.shape[-1] - self.tail_len:]
        # staging stays RAW BYTES — concat, then pad(byte 128 == int8 -128
        # == "no signal"), then a FREE u8->i8 bitcast reinterpret (no xor —
        # the (x-128)/128 normalization happens in-kernel). The old chain
        # (concat, xor+bitcast pass, pad pass) cost one more full HBM pass
        # over the raw stream; a single 3-operand concat variant was also
        # measured and lowered to a slower dynamic-update-slice. These
        # staging passes disappear entirely on the call_staged path, where
        # the HOST ingest pre-builds the padded operand.
        pad = rows_total * self.stride - xx.shape[-1]
        xf = jnp.pad(xx, [(0, 0)] * (xx.ndim - 1) + [(0, pad)],
                     constant_values=jnp.uint8(128))
        xf = jax.lax.bitcast_convert_type(xf, jnp.int8)
        demod, new_prev = self._dispatch(xf, n2, prev_i, prev_q)
        return demod, new_tail, new_prev[..., 0], new_prev[..., 1]

    def _dispatch(self, xf: jax.Array, n2: int,
                  prev_i: jax.Array, prev_q: jax.Array):
        """Padded int8 stream (..., rows_total*stride) -> (demod, new_prev)."""
        rows_total = self._plan(n2)[4]
        rows = xf.reshape(xf.shape[:-1] + (rows_total, self.stride))
        return self._dispatch_rows(rows, xf, n2, prev_i, prev_q)

    def _dispatch_rows(self, rows: jax.Array, xf, n2: int,
                       prev_i: jax.Array, prev_q: jax.Array,
                       bnd_windows=None):
        """Kernel dispatch on the (..., rows_total, stride) int8 operand;
        ``xf`` is its flat view when THAT is the primary layout (the
        unstaged path), or None for the rows-form staged path.
        ``bnd_windows``: host-staged (..., nbf, 2K) int8 boundary byte
        windows (stage_segment_full) — without them the windows are
        sliced from the big operand, which relayout-copies it whole."""
        n_out, c_frames, tf, nbf, rows_total = self._plan(n2)

        # only each TILE's first frame needs an external predecessor (the
        # previous tile's last output); in-tile predecessors are a sublane
        # shift inside the kernel. nbf-1 tiny f32 dots over the boundary
        # byte windows (one small gather+einsum — nbf ~ n_out/8192, three
        # orders of magnitude less traffic than per-frame windows); tile 0
        # uses the carried (prev_i, prev_q) state
        new_prev_pre = None
        if bnd_windows is not None:
            dots = self._window_dots(bnd_windows)      # (..., nbf, 2)
            first = jnp.stack([prev_i, prev_q], axis=-1)[..., None, :]
            bnd = jnp.concatenate([first, dots[..., :nbf - 1, :]],
                                  axis=-2)             # (..., nbf, 2)
            new_prev_pre = dots[..., nbf - 1, :]
        elif nbf > 1:
            m_bnd = (np.arange(1, nbf) * tf * self.g - 1)
            bnd = (self._boundary_dots(xf, m_bnd) if xf is not None
                   else self._boundary_dots_rows(rows, m_bnd))
            first = jnp.stack([prev_i, prev_q], axis=-1)[..., None, :]
            bnd = jnp.concatenate([first, bnd], axis=-2)  # (..., nbf, 2)
        else:
            bnd = jnp.stack([prev_i, prev_q], axis=-1)[..., None, :]
        pi_arr = bnd[..., 0:1]
        pq_arr = bnd[..., 1:2]

        batch = rows.shape[:-2]
        tf_blocks = tf // 32
        band = (self._band_plan()
                if _BAND and not (_INT8 or _SPLIT) else None)
        wide = _WIDE and not _SPLIT and band is None
        assert not (_INT8 and _SPLIT), \
            "RTSDR_FRONTEND_INT8 and RTSDR_FRONTEND_SPLIT are exclusive"
        kern = functools.partial(
            _kernel, tf=tf, g=self.g, stride=self.stride, jp=self.jp,
            s_over=self.s_over,
            int8_scales=self._wq_scales if _INT8 else None, wide=wide,
            band=band[:3] if band is not None else None)
        w_hi, w_lo = ((self._wq_hi, self._wq_lo) if _INT8
                      else (self._w_hi, self._w_lo))
        if band is not None:
            w_hi = band[3]
            w_lo = np.zeros((8, 128), dtype=np.asarray(w_hi).dtype)
        elif wide:
            # one (jp, 4g) weight operand [hi | lo] (cached — this runs
            # per eager call in tests); the wlo slot shrinks to a minimal
            # dummy block (the kernel never reads it)
            w_hi = getattr(self, "_wide_cache", None)
            if w_hi is None:
                w_hi = self._wide_cache = np.concatenate(
                    [np.asarray(self._w_hi), np.asarray(self._w_lo)],
                    axis=1)
            w_lo = np.zeros((8, 128), dtype=np.asarray(w_hi).dtype)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nbf * tf, self.g), jnp.float32),
            grid=(nbf,),
            in_specs=[
                pl.BlockSpec((tf, self.stride), lambda fi: (fi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32, self.stride),
                             lambda fi, _t=tf_blocks: ((fi + 1) * _t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(w_hi.shape) if (wide or band is not None)
                             else (self.jp, 2 * self.g),
                             lambda fi: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128) if (wide or band is not None)
                             else (self.jp, 2 * self.g),
                             lambda fi: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nbf, 1), lambda fi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbf, 1), lambda fi: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tf, self.g), lambda fi: (fi, 0),
                                   memory_space=pltpu.VMEM),
            interpret=self.interpret,
        )
        fn = call
        for _ in batch:
            fn = jax.vmap(fn, in_axes=(0, 0, None, None, 0, 0))
        out = fn(rows, rows, jnp.asarray(w_hi),
                 jnp.asarray(w_lo), pi_arr, pq_arr)
        demod = out.reshape(batch + (nbf * tf * self.g,))[..., :n_out]
        if new_prev_pre is not None:
            new_prev = new_prev_pre
        else:
            new_prev = (self._boundary_sample(xf, n_out - 1)
                        if xf is not None
                        else self._boundary_dots_rows(
                            rows, [n_out - 1])[..., 0, :])
        return demod, new_prev
