"""Parity tests for the fused Pallas front end (interpret mode on CPU).

The fused kernel must match the golden float64 loop oracle at least as
well as the XLA DualPhaseFIR+fm_demod path it replaces, under the same
state contract (reference state surface: src/filter.cpp:119 FIR tails +
src/demod.cpp:21-22 carried discriminator samples).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golden import dsp as g
from real_time_sdr_tpu.config import mode_config
from real_time_sdr_tpu.models.frontend import Frontend
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.ops.pallas.frontend_fused import FusedFrontendFIR


def _snr(ref, y):
    e = np.asarray(y, np.float64) - ref
    return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(e ** 2), 1e-30))


def _golden_frontend(x, tail, h, down, prev_i, prev_q):
    K = len(h)
    xx = np.concatenate([tail, x])
    s = (xx.astype(np.float64) - 128.0) / 128.0
    i_s, q_s = s[0::2], s[1::2]
    gi, _ = g.fir_block(i_s[K - 1:], h, i_s[:K - 1], down)
    gq, _ = g.fir_block(q_s[K - 1:], h, q_s[:K - 1], down)
    gd, pi, pq = g.fm_demod_block(gi, gq, prev_i, prev_q)
    return gd, pi, pq


@pytest.mark.parametrize("mode", [0, 1, 3])
def test_fused_frontend_golden_parity(mode):
    """On random uint8 noise the demod's 1/|IQ|^2 amplifies rounding at
    near-zero-envelope samples (real FM is constant-modulus), so the gate is
    relative to the XLA path on the same fixture plus a 60 dB floor."""
    cfg = mode_config(mode)
    rng = np.random.default_rng(7 + mode)
    h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    n2 = 2 * cfg.block_size_iq
    x = rng.integers(0, 256, (n2,), dtype=np.uint8)
    tail = rng.integers(0, 256, (2 * cfg.rf_taps - 2,), dtype=np.uint8)
    gd, gpi, gpq = _golden_frontend(x, tail, h, cfg.rf_decim, 0.1, -0.2)

    from real_time_sdr_tpu.ops.demod import fm_demod
    from real_time_sdr_tpu.ops.fir import DualPhaseFIR
    rf = DualPhaseFIR(h, down=cfg.rf_decim)
    i2, q2, _ = rf(jnp.asarray(x), jnp.asarray(tail))
    dx, _, _ = fm_demod(i2, q2, jnp.float32(0.1), jnp.float32(-0.2))
    snr_xla = _snr(gd, dx)

    ff = FusedFrontendFIR(h, down=cfg.rf_decim, interpret=True)
    d, new_tail, pi, pq = ff(jnp.asarray(x), jnp.asarray(tail),
                             jnp.float32(0.1), jnp.float32(-0.2))
    assert d.shape == gd.shape
    snr_p = _snr(gd, d)
    assert snr_p > 60.0 and snr_p > snr_xla - 6.0, (snr_p, snr_xla)
    assert np.array_equal(np.asarray(new_tail), x[-(2 * cfg.rf_taps - 2):])
    assert abs(float(pi) - gpi) < 1e-4 and abs(float(pq) - gpq) < 1e-4


def test_fused_frontend_streaming_matches_oneshot():
    """Three chained blocks == one triple-length call (state contract)."""
    cfg = mode_config(0)
    rng = np.random.default_rng(11)
    h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    ff = FusedFrontendFIR(h, down=cfg.rf_decim, interpret=True)
    n2 = 2 * cfg.block_size_iq
    xs = rng.integers(0, 256, (3 * n2,), dtype=np.uint8)
    tail0 = np.full((ff.tail_len,), 128, np.uint8)

    d_all, _, _, _ = ff(jnp.asarray(xs), jnp.asarray(tail0),
                        jnp.float32(0.0), jnp.float32(0.0))
    tail, pi, pq = jnp.asarray(tail0), jnp.float32(0.0), jnp.float32(0.0)
    parts = []
    for b in range(3):
        d, tail, pi, pq = ff(jnp.asarray(xs[b * n2:(b + 1) * n2]), tail,
                             pi, pq)
        parts.append(np.asarray(d))
    chained = np.concatenate(parts)
    assert _snr(np.asarray(d_all, np.float64), chained) > 90.0


def test_fused_frontend_batched():
    """vmap over a channel axis matches per-channel calls."""
    cfg = mode_config(0)
    rng = np.random.default_rng(13)
    h = filters.design_lpf(cfg.rf_fs, cfg.rf_fc, cfg.rf_taps)
    ff = FusedFrontendFIR(h, down=cfg.rf_decim, interpret=True)
    n2 = 2 * cfg.block_size_iq
    xs = rng.integers(0, 256, (3, n2), dtype=np.uint8)
    tails = rng.integers(0, 256, (3, ff.tail_len), dtype=np.uint8)
    pis = jnp.asarray([0.1, -0.5, 0.0], jnp.float32)
    pqs = jnp.asarray([0.2, 0.0, -0.3], jnp.float32)
    db, _, _, _ = ff(jnp.asarray(xs), jnp.asarray(tails), pis, pqs)
    for c in range(3):
        dc, _, _, _ = ff(jnp.asarray(xs[c]), jnp.asarray(tails[c]),
                         pis[c], pqs[c])
        np.testing.assert_allclose(np.asarray(db[c]), np.asarray(dc),
                                   atol=1e-6)


def test_frontend_impl_interchange():
    """Frontend(impl=pallas_interpret) == Frontend(impl=xla) within SNR,
    sharing one FrontendState layout."""
    cfg = mode_config(0)
    rng = np.random.default_rng(17)
    fx = Frontend(cfg, impl="xla")
    fp = Frontend(cfg, impl="pallas_interpret")
    n2 = 2 * cfg.block_size_iq
    x = jnp.asarray(rng.integers(0, 256, (n2,), dtype=np.uint8))
    st_x, st_p = fx.init_state(), fp.init_state()
    assert jax.tree_util.tree_structure(st_x) == \
        jax.tree_util.tree_structure(st_p)
    dx, sx = fx(x, st_x)
    dp, sp = fp(x, st_p)
    assert _snr(np.asarray(dx, np.float64), dp) > 65.0
    # cross-impl state handoff: run pallas from the xla state
    dp2, _ = fp(x, sx)
    dx2, _ = fx(x, sp)
    assert _snr(np.asarray(dx2, np.float64), dp2) > 65.0


def test_bench_staged_cells_match_plain_receiver():
    """The bench's serving path — stage_cells building batched
    (rows, bnd, tail) triples + the vmapped run_segment_staged — must be
    BIT-identical per channel to the plain per-channel run_segment (this
    is the exact program bench.py times; steady-state cyclic tails)."""
    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.utils import benchkit, synth

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3,
                  frontend_impl="pallas_interpret")
    cfg = rx.cfg
    n_ch, n_blk = 3, 2
    n_len = n_blk * 2 * cfg.block_size_iq
    iq, _ = synth.station_iq(cfg, n_blk)
    per_ch = benchkit.shifted_channel_segments_host(iq, n_ch, n_len)
    cells = benchkit.stage_cells(rx, per_ch, 1, n_ch, 1, n_len)
    cell = cells[0][0]
    assert isinstance(cell, tuple) and len(cell) == 3

    st = rx.init_state(batch=(n_ch,))
    vstep = jax.vmap(lambda s, xp: rx.run_segment_staged(s, xp, n_len))
    st2, out = vstep(st, cell)

    for c in range(n_ch):
        # the staged cell embeds the CYCLIC steady-state tail (the end of
        # the same chunk); reproduce it through the plain receiver by
        # seeding the frontend tail identically
        s1 = rx.init_state()
        tail = per_ch[c][-rx.frontend.rf_fir.tail_len:]
        s1 = s1._replace(frontend=s1.frontend._replace(
            iq_tail=jnp.asarray(tail)))
        _, out_c = rx.run_segment(s1, jnp.asarray(per_ch[c]))
        # vmapped vs single-channel XLA lowerings may differ at f32 ulp
        # level (batched einsum tiling); decode DECISIONS must be exact
        for la, lb in zip(jax.tree_util.tree_leaves(out_c),
                          jax.tree_util.tree_leaves(out)):
            a, b = np.asarray(la), np.asarray(lb)[c]
            if a.dtype.kind in "iu":
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("mode", [0, 2])
@pytest.mark.parametrize("rows", [False, True, "full"])
def test_staged_segment_bit_exact(mode, rows):
    """run_segment_staged over a HOST-staged operand must be BIT-identical
    to run_segment on the raw segment, across chained segments and when
    staged/unstaged calls interleave (the state contract is shared) — in
    all three operand forms (flat uint8, pre-shaped int8 rows, and the
    (rows, bnd, tail) triple of stage_segment_full)."""
    from real_time_sdr_tpu.models.receiver import Receiver

    rx = Receiver(mode, stereo=True, rds=True, pll_tier=3,
                  frontend_impl="pallas_interpret")
    cfg = rx.cfg
    n2 = 2 * 2 * cfg.block_size_iq  # 2-block segments
    rng = np.random.default_rng(4)
    segs = [rng.integers(0, 256, (n2,), dtype=np.uint8) for _ in range(3)]

    s_a = s_b = rx.init_state()
    tail = np.asarray(s_b.frontend.iq_tail)
    for k, seg in enumerate(segs):
        s_a, out_a = rx.run_segment(s_a, jnp.asarray(seg))
        if k == 1:
            # interleave: middle segment goes UNstaged through path B too
            s_b, out_b = rx.run_segment(s_b, jnp.asarray(seg))
        elif rows == "full":
            xp = rx.frontend.stage_segment_full(tail, seg)
            assert xp[0].dtype == np.int8 and xp[0].ndim == 2
            assert xp[1].dtype == np.int8 and xp[1].ndim == 2
            assert xp[2].dtype == np.uint8
            s_b, out_b = rx.run_segment_staged(
                s_b, jax.device_put(xp), n2)
        else:
            xp = rx.frontend.stage_segment(tail, seg, rows=rows)
            if rows:
                assert xp.dtype == np.int8 and xp.ndim == 2
            else:
                assert xp.shape[-1] == rx.frontend.staged_len(n2)
            s_b, out_b = rx.run_segment_staged(s_b, jnp.asarray(xp), n2)
        tail = seg[-rx.frontend.rf_fir.tail_len:]
        for la, lb in zip(jax.tree_util.tree_leaves(out_a),
                          jax.tree_util.tree_leaves(out_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        for la, lb in zip(jax.tree_util.tree_leaves(s_a),
                          jax.tree_util.tree_leaves(s_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
