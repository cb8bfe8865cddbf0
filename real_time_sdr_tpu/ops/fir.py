"""Streaming FIR kernels: causal block convolution, decimation, and rational
polyphase resampling with overlap-save carried state.

TPU-native redesign of the reference's hot kernel pair
(``convolveFIR`` decimating overload, src/filter.cpp:106-121, and the fused
polyphase resampler, src/filter.cpp:123-147).

Formulation: every (up, down) case reduces to ONE dense matmul per block —
the MXU-shaped "framed polyphase" form. Group R consecutive outputs
(R = up * g, with g chosen so R is ~128) into a frame; those outputs read a
contiguous J-sample window of the (tail-prefixed) input advancing by
g*down samples per frame:

    y[c*R + r] = sum_j  F[c, j] * W[j, r]
    F[c, j]    = xx[c*g*down + j]                  (pure reshape+slice)
    W[j, r]    = h[p_r + up*m]  where j = T-1 + qr_r - m, else 0

with p_r = (r*down) % up, qr_r = (r*down) // up, T = ceil(K/up). F is built
from shifted slices of one reshape — no gathers, no 1-channel convolutions,
both of which are pathologically slow on TPU. W is a (J, R) compile-time
constant. The matmul wastes ~J/T flops on structural zeros but runs at MXU
speed, which on TPU beats any "efficient" scalar indexing by orders of
magnitude.

State contract: the carry holds the last ``T-1`` *input* samples. (The
reference stores K-1 samples; only the final T-1 are ever read by its
indexing, so the contracts are equivalent. For the long polyphase audio
banks the reference's state copy reads before the buffer start — UB we do
not replicate.)

A single-nonzero-tap filter (the reference's all-pass delay,
src/filter.cpp:73-78) is detected and lowered to a scaled slice.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PolyFIR", "state_len", "init_state", "make_bank", "barrier"]

# Experiment hooks: RTSDR_NO_BARRIER="tag1,tag2" (or "all") drops the
# fusion barriers at the named sites; RTSDR_BARRIER="tag1,tag2" force-keeps
# them, so the effect can be MEASURED per site on real hardware
# (experiments/barrier_ab.py). Precedence: force > drop > default-off —
# a tag named in RTSDR_BARRIER keeps its barrier even under
# RTSDR_NO_BARRIER=all (there is no RTSDR_BARRIER=all); unset both to get
# the measured defaults.
#
# Defaults (v5e A/B sweeps, digests byte-identical throughout): the
# FRONTEND sites ("dualphase"/"frontend") and the channelizer's "chan"
# site ship barrier-free since 2026-08-19. The round-5 re-sweep on the
# rot-restructured graph (2026-08-20, BENCH_NOTES) also dropped
# "polyfir"/"shared"/"pll": the historic fusion-search compile explosion
# stays gone at every measured shape (16/32/128ch x 12/48blk, modes 0-3,
# 8/64-station wideband — all compiles <=38 s), the flagship aggregate
# ties, and the small-bank shapes win big (16ch +14-20%, 8-station
# wideband +10%, mode 3 +6%). Only "chanfold" still pays for itself
# (the fold-graph explosion below is real). RTSDR_BARRIER=
# polyfir,shared,pll restores the old conservative set; re-sweep after
# structural changes (experiments/barrier_ab.py).
_NO_BARRIER = frozenset(
    t.strip() for t in os.environ.get("RTSDR_NO_BARRIER", "").split(",")
    if t.strip())
_FORCE_BARRIER = frozenset(
    t.strip() for t in os.environ.get("RTSDR_BARRIER", "").split(",")
    if t.strip())
# f32 framed-matmul precision. On TPU the default is HIGH — the 3-pass
# bf16x3 algorithm — instead of HIGHEST (6-pass exact f32): the three
# IF/sync FIR banks are the largest MXU consumers in the receiver, and
# the A/B (v5e 32x12 staged, 2026-08-20) measured -13..-15% us/blk/ch on
# EVERY mode with full-chain audio at 98.1 dB vs the 6-pass path (above
# the int16 PCM floor) and all stereo/RDS decode gates green. This is the
# SECOND sanctioned exception to the f32-HIGHEST rule (CLAUDE.md; the
# first is the bf16 channelizer FIR). Elsewhere (CPU/GPU) precision is a
# no-op for f32 dots, so the exact default stays. RTSDR_FIR_PREC=
# highest|high overrides.
_F32_PREC_NAME = os.environ.get("RTSDR_FIR_PREC", "auto")
assert _F32_PREC_NAME in ("auto", "highest", "high"), (
    f"RTSDR_FIR_PREC={_F32_PREC_NAME!r}: use 'auto', 'highest' or 'high'")

_DEFAULT_OFF = frozenset(("dualphase", "frontend", "chan",
                          "polyfir", "shared", "pll"))
# "chan" (the channelizer's MIX-mode wideband FIR stage): barrier-free is
# ~3% faster at 64 stations with identical compile time (2026-08-19 A/B);
# it is not part of the chained-FIR pattern the polyfir barrier guards.
# "chanfold" (the FOLDED-tone channelizer's shared-rail input) is default
# ON: barrier-free, XLA's fusion search across the fold's frame
# construction + the 64-station bank EXPLODES (compile never finished in
# 20 min on v5e, 2026-08-20); with the barrier it compiles in 11 s and
# runs 11.8x realtime (2.1x the mix path).
# The canonical universe of barrier tags. Experiments that force/drop sites
# (experiments/barrier_ab.py) import this so "baseline = all barriers" stays
# true when a new site is added.
ALL_BARRIER_TAGS = frozenset(("pll", "polyfir", "shared", "frontend",
                              "dualphase", "chan", "chanfold"))


def _f32_precision():
    name = _F32_PREC_NAME
    if name == "auto":
        name = ("high" if jax.default_backend() in ("tpu", "axon")
                else "highest")
    return (jax.lax.Precision.HIGH if name == "high"
            else jax.lax.Precision.HIGHEST)


def barrier(x, tag: str):
    """``jax.lax.optimization_barrier`` unless disabled for ``tag``."""
    if tag not in _FORCE_BARRIER and (
            "all" in _NO_BARRIER or tag in _NO_BARRIER
            or tag in _DEFAULT_OFF):
        return x
    return jax.lax.optimization_barrier(x)


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

    Per input length a constant "plan" (frame geometry + weight matrix) is
    computed once on the host and folded into the jitted graph.
    """

    def __init__(self, h: np.ndarray, up: int = 1, down: int = 1,
                 target_frame: int = 128, barrier_tag: str = "polyfir",
                 compute_dtype: str = "f32"):
        h = np.asarray(h, dtype=np.float64)
        assert h.ndim == 1
        self.up = int(up)
        self.down = int(down)
        self.barrier_tag = barrier_tag  # per-site A/B (ALL_BARRIER_TAGS)
        # "bf16": single native-MXU pass (frames+taps bf16, f32 accumulate,
        # ~8-bit mantissa). ONLY for stages whose consumer quantizes harder
        # than bf16 anyway (the channelizer feeds uint8 re-encode) — every
        # full-precision DSP stage must stay f32 HIGHEST (CLAUDE.md rule).
        assert compute_dtype in ("f32", "bf16"), compute_dtype
        self.compute_dtype = compute_dtype
        self.num_taps = K = h.shape[0]
        self.T = -(-K // up)  # input samples touched per output
        self._h = h
        self._target_frame = target_frame
        nz = np.nonzero(h)[0]
        # single-tap filters (all-pass delay) lower to a scaled shift
        self._single_tap = (len(nz) == 1) and up == 1 and down == 1
        self._tap_pos = int(nz[0]) if len(nz) else 0
        self._tap_gain = float(h[self._tap_pos]) if len(nz) else 0.0
        # bf16 is only implemented for the framed-matmul path; the
        # single-tap (pure delay) lowering would change the output dtype
        assert not (self.compute_dtype == "bf16" and self._single_tap), \
            "bf16 compute is not supported for single-tap (delay) filters"
        self._plan_cache: dict[int, tuple] = {}

    @property
    def tail_len(self) -> int:
        return self.T - 1

    def _plan(self, n: int):
        if n in self._plan_cache:
            return self._plan_cache[n]
        up, down, T, K = self.up, self.down, self.T, self.num_taps
        n_out = (n * up) // down  # C++ truncation (src/filter.cpp:124)
        g = max(1, round(self._target_frame / up))
        R = g * up                      # outputs per frame
        stride = g * down               # input samples per frame
        rs = np.arange(R, dtype=np.int64)
        p = (rs * down) % up
        qr = (rs * down) // up
        J = T + int(qr.max())           # window samples per frame
        # W[j, r] = h[p_r + up*m] at j = (T-1) + qr_r - m
        W = np.zeros((J, R), dtype=np.float64)
        for r in range(R):
            for m in range(T):
                k = p[r] + up * m
                if k < K:
                    W[T - 1 + qr[r] - m, r] = self._h[k]
        c_frames = -(-n_out // R)
        s_over = -(-J // stride)        # how many stride-rows a window spans
        pad_to = (c_frames + s_over) * stride
        plan = (n_out, R, stride, J, W.astype(np.float32), c_frames, s_over,
                pad_to)
        self._plan_cache[n] = plan
        return plan

    def cost(self, n: int) -> dict:
        """Static per-block work accounting for speed-of-light analysis.

        Returns matmul dims, FLOPs, and minimum HBM bytes for an (n,)-sample
        input block (single channel)."""
        if self._single_tap:
            return {"kind": "delay", "flops": 0, "bytes": 8 * n,
                    "w_bytes": 0, "dims": (0, 0, 0)}
        n_out, R, stride, J, W, c_frames, s_over, pad_to = self._plan(n)
        flops = 2 * c_frames * J * R
        # HBM floor: the barrier-materialized stage input + weights + output.
        # NOT c_frames*J — XLA fuses frame construction into the matmul, so
        # the frame matrix never hits HBM (measured, BENCH_NOTES 32x12 A/B).
        # bf16 mode moves 2-byte elements for the input/tails/weights (the
        # output stays f32). "w_bytes" (the weight share of "bytes") is
        # broken out because weights stream once per DISPATCH, not once per
        # block-channel — utils/logging.stage_costs amortizes it over the
        # serving shape (the round-4 floor model charged it per blk/ch,
        # overstating weight-heavy stages up to 10x — BENCH_NOTES r5).
        el = 2 if self.compute_dtype == "bf16" else 4
        byts = el * (n + self.tail_len + J * R) + 4 * n_out
        return {"kind": f"fir_{self.compute_dtype}", "flops": flops,
                "bytes": byts, "w_bytes": el * J * R,
                "dims": (c_frames, J, R)}

    def __call__(self, x: jax.Array, tail: jax.Array):
        """Apply to one block. x: (..., N); tail: (..., T-1).

        Returns (y, new_tail) with y: (..., N*up//down)."""
        n = x.shape[-1]
        if self.compute_dtype == "bf16":
            # the whole stage input rides bf16 (half the HBM traffic of the
            # dominant wideband arrays); carried tails stay f32 in the state
            # pytree (npz round-trip, CLAUDE.md) and cast on entry/exit
            xx = jnp.concatenate([tail.astype(jnp.bfloat16),
                                  x.astype(jnp.bfloat16)], axis=-1)
        else:
            xx = jnp.concatenate([tail, x.astype(tail.dtype)], axis=-1)
        # Materialize the stage input: without this, XLA's fusion search over
        # chained frame-construction patterns (pad/reshape/slice/concat from
        # consecutive FIR stages) explodes both compile time (>15 min) and
        # runtime (~50x) on TPU. Measured on the RDS chain, see bench notes.
        # The single-tap (pure delay) path builds no frames — it lowers to a
        # slice — so it stays barrier-free and fuses into its consumer.
        if not self._single_tap:
            xx = barrier(xx, self.barrier_tag)
        if self._single_tap:
            # pure delay of (K-1-tap_pos)... reference indexing: y[n] =
            # h[pos] * xx[T-1 + n - pos]
            start = self.T - 1 - self._tap_pos
            y = self._tap_gain * jax.lax.slice_in_dim(
                xx, start, start + n, axis=-1)
        else:
            n_out, R, stride, J, W, c_frames, s_over, pad_to = self._plan(n)
            pad = pad_to - xx.shape[-1]
            if pad > 0:
                xp = jnp.pad(xx, [(0, 0)] * (xx.ndim - 1) + [(0, pad)])
            else:
                xp = xx
            rows = xp.reshape(xp.shape[:-1] + (-1, stride))
            # window for frame c spans rows c .. c+s_over-1
            parts = [rows[..., s:s + c_frames, :] for s in range(s_over)]
            frames = jnp.concatenate(parts, axis=-1)[..., :J]
            if self.compute_dtype == "bf16":
                y = jnp.einsum("...cj,jr->...cr", frames,
                               jnp.asarray(W, dtype=jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            else:
                y = jnp.einsum("...cj,jr->...cr", frames,
                               jnp.asarray(W, dtype=frames.dtype),
                               precision=_f32_precision())
            y = y.reshape(y.shape[:-2] + (-1,))[..., :n_out]
        new_tail = (xx[..., xx.shape[-1] - self.tail_len:]
                    if self.tail_len else xx[..., :0])
        if new_tail.dtype != tail.dtype:
            new_tail = new_tail.astype(tail.dtype)
        return y, new_tail


def shared_frames_apply(firs: list["PolyFIR"], x: jax.Array,
                        tail: jax.Array):
    """Apply several same-geometry FIRs to ONE input with ONE matmul.

    All filters must share (up, down, num_taps); they then read identical
    frame matrices, so the frame construction (the layout-bound part) runs
    once and the weights concatenate into a single (J, n_filters*R) matrix —
    one MXU pass instead of n_filters memory-bound passes. The carried tail
    is the same input history for every filter, so ONE tail serves all.

    Returns ([y_0, ..., y_{n-1}], new_tail).
    """
    f0 = firs[0]
    assert all((f.up, f.down, f.num_taps) == (f0.up, f0.down, f0.num_taps)
               for f in firs)
    assert not f0._single_tap
    # the shared path computes f32 HIGHEST; a bf16-configured member would
    # silently lose its intended traffic halving — refuse loudly instead
    assert all(f.compute_dtype == "f32" for f in firs), \
        "shared_frames_apply does not implement bf16 compute"
    n = x.shape[-1]
    xx = jnp.concatenate([tail, x.astype(tail.dtype)], axis=-1)
    xx = barrier(xx, "shared")
    n_out, R, stride, J, _, c_frames, s_over, pad_to = f0._plan(n)
    w_cat = np.concatenate([f._plan(n)[4] for f in firs], axis=1)
    pad = pad_to - xx.shape[-1]
    if pad > 0:
        xp = jnp.pad(xx, [(0, 0)] * (xx.ndim - 1) + [(0, pad)])
    else:
        xp = xx
    rows = xp.reshape(xp.shape[:-1] + (-1, stride))
    parts = [rows[..., s:s + c_frames, :] for s in range(s_over)]
    frames = jnp.concatenate(parts, axis=-1)[..., :J]
    y = jnp.einsum("...cj,jr->...cr", frames,
                   jnp.asarray(w_cat, dtype=frames.dtype),
                   precision=_f32_precision())
    # y: (..., c_frames, n_filters*R) -> per-filter (..., n_out)
    outs = []
    for i in range(len(firs)):
        yi = y[..., i * R:(i + 1) * R]
        outs.append(yi.reshape(yi.shape[:-2] + (-1,))[..., :n_out])
    new_tail = (xx[..., xx.shape[-1] - f0.tail_len:]
                if f0.tail_len else xx[..., :0])
    return outs, new_tail


class _XlaBank:
    """XLA-path bank: shared_frames_apply for n>1, plain PolyFIR for n=1."""

    def __init__(self, firs: list["PolyFIR"]):
        self.firs = firs

    @property
    def tail_len(self) -> int:
        return self.firs[0].tail_len

    def __call__(self, x: jax.Array, tail: jax.Array):
        if len(self.firs) == 1:
            y, t = self.firs[0](x, tail)
            return [y], t
        return shared_frames_apply(self.firs, x, tail)


# Measured per-site backend choice on TPU v5e (BENCH_NOTES.md A/B at
# 32ch x 12blk): the in-graph XLA framed matmuls win at EVERY site — XLA
# fuses the frame construction into the matmul (no HBM frame matrix), so
# the Pallas kernel's VMEM frames save nothing while its per-pallas_call
# dispatch adds up (all-pallas 2604x, if+audio-pallas 2868x, all-xla
# 3120x). The Pallas bank remains selectable (RTSDR_FIR[_<SITE>]=pallas)
# as the measured alternative; re-evaluate on new jax/Mosaic releases.
_SITE_DEFAULT_TPU = {
    "if": "xla",          # IF band triple / pilot+band pair
    "audio": "xla",       # audio-rate polyphase resamplers
    "rds_bb": "xla",      # 247/640 baseband bank (per-block batch)
    "rds_rrc": "xla",     # RRC matched filter (per-block batch)
    "sync": "xla",        # tier-3 Hilbert + smoothers
}


def make_bank(firs: list["PolyFIR"], impl: str | None = None,
              site: str | None = None):
    """Bind same-geometry FIRs to the best backend for this platform.

    Returns a callable ``(x, tail) -> ([y_0..y_{n-1}], new_tail)`` with the
    PolyFIR state contract. Selection: explicit ``impl``, else the
    ``RTSDR_FIR_<SITE>`` env var, else ``RTSDR_FIR``, else the measured
    per-site default (currently "xla" at every site — see the table
    above). Geometries the Pallas kernel cannot tile (stride not
    lane-aligned, single-tap delays) silently use the XLA path.
    """
    if impl is None and site is not None:
        impl = os.environ.get(f"RTSDR_FIR_{site.upper()}")
    impl = impl or os.environ.get("RTSDR_FIR", "auto")
    if impl == "auto":
        if jax.default_backend() in ("tpu", "axon"):
            impl = _SITE_DEFAULT_TPU.get(site or "", "xla")
        else:
            impl = "xla"
    if impl in ("pallas", "pallas_interpret"):
        from real_time_sdr_tpu.ops.pallas.polyfir import (FramedFIRBank,
                                                          pallas_supported)
        if pallas_supported(firs):
            return FramedFIRBank(firs,
                                 interpret=(impl == "pallas_interpret"))
    return _XlaBank(firs)


class DualPhaseFIR:
    """Decimating FIR applied directly to an INTERLEAVED I/Q stream.

    The RF front end's deinterleave (src/rffrontend.cpp:58-63) is a strided
    byte shuffle — pathologically slow on TPU layouts. Linearity lets us skip
    it: filtering the even (I) and odd (Q) positions of the interleaved
    stream s with stride-2 zero-stuffed taps is the same computation, and
    both phases fold into ONE framed matmul whose weight matrix carries the
    I-columns and Q-columns side by side:

        I_ds[n] = sum_k h[k] * s[2(n*down - k)]
        Q_ds[n] = sum_k h[k] * s[2(n*down - k) + 1]

    Input: the raw interleaved uint8 capture (..., 2N); carried tail of
    2K-2 interleaved raw samples == the reference's two K-1 tails. The
    (x-128)/128 normalization (src/rffrontend.cpp:60) never materializes:
    frame construction happens in uint8 (1/4 the traffic), the framed
    matrix is cast to bf16 (exact for 8-bit data), the /128 folds into the
    weights and the -128 into a per-output constant:

        (sum_k h[k] (x-128))/128 = frames_u8 @ (W/128) - sum_k h[k]
    """

    def __init__(self, h: np.ndarray, down: int, target_frame: int = 128,
                 split_bf16: bool = True):
        h = np.asarray(h, dtype=np.float64)
        self.down = int(down)
        self.num_taps = K = h.shape[0]
        self._h = h
        self._target = target_frame
        # uint8-derived samples are EXACT in bfloat16, so the data side loses
        # nothing; full f32 tap precision is preserved by splitting W into a
        # hi+lo bf16 pair and accumulating two native MXU passes in f32 —
        # halving frame-matrix bandwidth vs f32 HIGHEST (6-pass) emulation.
        self.split_bf16 = split_bf16
        self._plan_cache: dict[int, tuple] = {}

    @property
    def tail_len(self) -> int:
        return 2 * self.num_taps - 2

    def _plan(self, n2: int):
        """n2: interleaved input length (= 2N)."""
        if n2 in self._plan_cache:
            return self._plan_cache[n2]
        K, down = self.num_taps, self.down
        n = n2 // 2
        n_out = n // down
        R = max(1, self._target)
        k2 = 2 * K - 1            # span of the zero-stuffed taps
        dprime = 2 * down         # interleaved stride per output
        J = dprime * (R - 1) + k2 + 1  # +1 for the Q offset
        W = np.zeros((J, 2 * R), dtype=np.float64)
        for r in range(R):
            for k in range(K):
                j = r * dprime + (k2 - 1) - 2 * k
                W[j, r] = h_val = self._h[k]
                W[j + 1, R + r] = h_val
        c_frames = -(-n_out // R)
        stride = R * dprime
        s_over = -(-J // stride)
        pad_to = (c_frames + s_over) * stride
        plan = (n_out, R, stride, J, W.astype(np.float32), c_frames, s_over,
                pad_to)
        self._plan_cache[n2] = plan
        return plan

    def cost(self, n2: int) -> dict:
        """Per-block work accounting (see PolyFIR.cost); n2 = 2N interleaved.

        Two bf16 MXU passes (hi+lo split taps) over a uint8-sourced frame
        matrix."""
        n_out, R, stride, J, W, c_frames, s_over, pad_to = self._plan(n2)
        flops = 2 * 2 * c_frames * J * (2 * R)  # hi+lo passes
        byts = (1 * (n2 + self.tail_len)  # uint8 stage input (frames fuse,
                                          # never hit HBM — BENCH_NOTES A/B)
                + 2 * 2 * J * 2 * R       # bf16 hi+lo weights
                + 4 * 2 * n_out)          # f32 I and Q outputs
        return {"kind": "fir_u8_bf16x2", "flops": flops, "bytes": byts,
                "w_bytes": 2 * 2 * J * 2 * R, "dims": (c_frames, J, 2 * R)}

    def __call__(self, s_u8: jax.Array, tail_u8: jax.Array):
        """s_u8: (..., 2N) raw interleaved uint8; tail_u8: (..., 2K-2) uint8.

        Returns (i_ds, q_ds, new_tail), streams (..., N//down) float32."""
        n2 = s_u8.shape[-1]
        xx = jnp.concatenate([tail_u8, s_u8], axis=-1)
        xx = barrier(xx, "dualphase")
        n_out, R, stride, J, W, c_frames, s_over, pad_to = self._plan(n2)
        pad = pad_to - xx.shape[-1]
        if pad > 0:
            xp = jnp.pad(xx, [(0, 0)] * (xx.ndim - 1) + [(0, pad)],
                         constant_values=128)  # pad with "zero" signal
        else:
            xp = xx
        rows = xp.reshape(xp.shape[:-1] + (-1, stride))
        parts = [rows[..., i:i + c_frames, :] for i in range(s_over)]
        frames = jnp.concatenate(parts, axis=-1)[..., :J]
        w_scaled = W / 128.0
        offset = np.float32(self._h.sum())
        if self.split_bf16:
            fb = frames.astype(jnp.bfloat16)  # exact: 8-bit integers
            w_hi = w_scaled.astype(jnp.bfloat16)
            w_lo = (w_scaled - w_hi.astype(np.float32)).astype(jnp.bfloat16)
            y = (jnp.einsum("...cj,jr->...cr", fb, jnp.asarray(w_hi),
                            preferred_element_type=jnp.float32)
                 + jnp.einsum("...cj,jr->...cr", fb, jnp.asarray(w_lo),
                              preferred_element_type=jnp.float32)) - offset
        else:
            y = jnp.einsum("...cj,jr->...cr", frames.astype(jnp.float32),
                           jnp.asarray(w_scaled, dtype=jnp.float32),
                           precision=jax.lax.Precision.HIGHEST) - offset
        i_ds = y[..., :R].reshape(y.shape[:-2] + (-1,))[..., :n_out]
        q_ds = y[..., R:].reshape(y.shape[:-2] + (-1,))[..., :n_out]
        new_tail = xx[..., xx.shape[-1] - self.tail_len:]
        return i_ds, q_ds, new_tail
