"""Sharded execution correctness on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.parallel.channel import ChannelBank
from real_time_sdr_tpu.parallel.time_shard import time_sharded_run
from real_time_sdr_tpu.utils import synth


def test_channel_bank_matches_single_channel():
    rx = Receiver(0, stereo=True, rds=False)
    iq, _ = synth.station_iq(rx.cfg, 2)
    blk = iq.reshape(2, -1)

    mesh = Mesh(np.array(jax.devices()), ("ch",))
    bank = ChannelBank(rx, n_channels=8, mesh=mesh)
    state = bank.init_state()
    blocks0 = bank.place(np.tile(blk[0], (8, 1)))
    state, outb = bank.step(state, blocks0)

    s1 = rx.init_state()
    s1, out1 = rx.jit_step(s1, jnp.asarray(blk[0]))

    for c in [0, 3, 7]:
        np.testing.assert_allclose(np.asarray(outb.left)[c],
                                   np.asarray(out1.left), rtol=2e-4,
                                   atol=2e-5)


def test_channel_bank_distinct_channels():
    # different stations on different channels decode independently
    rx = Receiver(0, stereo=True, rds=False)
    iq_a, _ = synth.station_iq(rx.cfg, 1, tone_left=440.0, tone_right=440.0)
    iq_b, _ = synth.station_iq(rx.cfg, 1, tone_left=2000.0, tone_right=2000.0)
    bank = ChannelBank(rx, n_channels=2)
    state = bank.init_state()
    blocks = jnp.stack([jnp.asarray(iq_a), jnp.asarray(iq_b)])
    state, out = bank.step(state, blocks)
    fs = float(rx.cfg.audio_fs)
    for c, f_expect in [(0, 440.0), (1, 2000.0)]:
        x = np.asarray(out.left)[c][rx.cfg.audio_block // 2:]
        sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        f = np.fft.rfftfreq(len(x), 1 / fs)[sp.argmax()]
        assert abs(f - f_expect) < 40


def test_channel_bank_grouped_segment_exact():
    # sequential 32-wide sub-batches (the v5e cache-locality serving shape)
    # produce bit-identical outputs and final state vs one wide batch
    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    bank = ChannelBank(rx, n_channels=8)
    state = bank.init_state()
    rng = np.random.default_rng(11)
    seg = jnp.asarray(rng.integers(
        0, 256, size=(8, 2 * 2 * rx.cfg.block_size_iq), dtype=np.uint8))
    s1, o1 = bank.run_segment(state, seg)
    s2, o2 = bank.run_segment_grouped(state, seg, group=4)
    for a, b in zip(jax.tree_util.tree_leaves(o1),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_time_sharding_exact_tier3_stereo_rds():
    """Exact mode (all-tier-3): sharded audio matches the sequential
    receiver to float precision and RDS bits are BIT-IDENTICAL — including
    every shard's first block (no warm-up discard in the outputs)."""
    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    n_blocks = 8
    iq, _ = synth.station_iq(rx.cfg, n_blocks)
    blocks = jnp.asarray(iq.reshape(n_blocks, -1))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("ch", "time"))
    outs = time_sharded_run(rx, mesh, blocks, overlap=1)
    assert outs is not None

    _, seq = rx.jit_run_blocks(rx.init_state(), blocks)

    for name in ("left", "right"):
        got = np.asarray(getattr(outs, name))
        ref = np.asarray(getattr(seq, name))
        err = np.mean((ref - got) ** 2)
        sig = np.mean(ref ** 2)
        snr = 10 * np.log10(sig / (err + 1e-30))
        assert snr > 100, f"{name}: snr {snr:.1f} dB"

    np.testing.assert_array_equal(np.asarray(outs.rds_nbits),
                                  np.asarray(seq.rds_nbits))
    np.testing.assert_array_equal(np.asarray(outs.rds_bits),
                                  np.asarray(seq.rds_bits))


def test_time_sharding_exact_auto_selects_tier3():
    from real_time_sdr_tpu.parallel.time_shard import _all_feedforward
    assert _all_feedforward(Receiver(0, stereo=True, rds=True, pll_tier=3))
    assert not _all_feedforward(Receiver(0, stereo=True, rds=True,
                                         pll_tier=1))
    assert _all_feedforward(Receiver(0, stereo=False))  # mono: no PLL


@pytest.mark.parametrize("overlap", [1, 2])
def test_time_sharding_matches_sequential_steady_state(overlap):
    rx = Receiver(0, stereo=True, rds=False)
    n_blocks = 8
    iq, _ = synth.station_iq(rx.cfg, n_blocks)
    blocks = jnp.asarray(iq.reshape(n_blocks, -1))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("ch", "time"))
    outs = time_sharded_run(rx, mesh, blocks, overlap=overlap)

    s = rx.init_state()
    _, seq = rx.jit_run_blocks(s, blocks)

    # Steady-state parity: skip each shard's first post-warm-up block (PLL
    # re-acquisition tail) and compare audio of the rest.
    nb_local = n_blocks // 4
    got = np.asarray(outs.left)
    ref = np.asarray(seq.left)
    for shard in range(4):
        for j in range(1, nb_local):
            b = shard * nb_local + j
            ref_b, got_b = ref[b], got[b]
            err = np.mean((ref_b - got_b) ** 2)
            sig = np.mean(ref_b ** 2) + 1e-12
            snr = 10 * np.log10(sig / (err + 1e-12))
            assert snr > 25, f"shard {shard} block {b}: snr {snr:.1f}"


@pytest.mark.slow
@pytest.mark.parametrize("t,n_blocks,overlap", [(2, 6, 1), (8, 16, 2)])
def test_time_sharding_exact_geometry_sweep(t, n_blocks, overlap):
    """Exactness is a structural property, not a fixed-geometry accident:
    other shard counts, blocks-per-shard, and overlap depths must also be
    bit-identical (RDS) / float-exact (audio) vs sequential."""
    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    iq, _ = synth.station_iq(rx.cfg, n_blocks, ps_name="GEOSWEEP")
    blocks = jnp.asarray(iq.reshape(n_blocks, -1))

    mesh = Mesh(np.array(jax.devices()[:t]).reshape(1, t), ("ch", "time"))
    outs = time_sharded_run(rx, mesh, blocks, overlap=overlap)
    _, seq = rx.jit_run_blocks(rx.init_state(), blocks)

    for name in ("left", "right"):
        got = np.asarray(getattr(outs, name))
        ref = np.asarray(getattr(seq, name))
        snr = 10 * np.log10(np.mean(ref ** 2) /
                            (np.mean((ref - got) ** 2) + 1e-30))
        assert snr > 100, f"t={t}: {name} snr {snr:.1f} dB"
    np.testing.assert_array_equal(np.asarray(outs.rds_nbits),
                                  np.asarray(seq.rds_nbits))
    np.testing.assert_array_equal(np.asarray(outs.rds_bits),
                                  np.asarray(seq.rds_bits))


@pytest.mark.slow
def test_joint_channel_time_sharding():
    """2-D mesh (ch, time): a channel-sharded bank whose per-channel block
    streams are ALSO time-sharded (exact mode) — RDS bits bit-identical and
    audio float-exact vs each channel's sequential receiver (VERDICT r2 #4).
    """
    from real_time_sdr_tpu.parallel.time_shard import time_sharded_run_bank

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    n_blocks = 8
    iq_a, _ = synth.station_iq(rx.cfg, n_blocks, ps_name="JOINT-A ",
                               tone_left=440.0, tone_right=900.0)
    iq_b, _ = synth.station_iq(rx.cfg, n_blocks, ps_name="JOINT-B ",
                               tone_left=600.0, tone_right=1500.0)
    blocks = jnp.stack([jnp.asarray(iq_a.reshape(n_blocks, -1)),
                        jnp.asarray(iq_b.reshape(n_blocks, -1))])

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("ch", "time"))
    outs = time_sharded_run_bank(rx, mesh, blocks, overlap=1)

    for c, iq in enumerate((iq_a, iq_b)):
        _, seq = rx.jit_run_blocks(rx.init_state(),
                                   jnp.asarray(iq.reshape(n_blocks, -1)))
        for name in ("left", "right"):
            got = np.asarray(getattr(outs, name))[c]
            ref = np.asarray(getattr(seq, name))
            snr = 10 * np.log10(np.mean(ref ** 2) /
                                (np.mean((ref - got) ** 2) + 1e-30))
            assert snr > 100, f"ch {c} {name}: snr {snr:.1f} dB"
        np.testing.assert_array_equal(np.asarray(outs.rds_nbits)[c],
                                      np.asarray(seq.rds_nbits))
        np.testing.assert_array_equal(np.asarray(outs.rds_bits)[c],
                                      np.asarray(seq.rds_bits))


def test_run_channelized_matches_explicit_two_step():
    """ChannelBank.run_channelized is the single wideband entry every
    serving path uses; pin it to the explicit call_u8 + run_segment
    composition (same channelizer, same states) bit-for-bit."""
    from conftest import mk_channelizer

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    n_st = 4
    offs = [int((k - (n_st - 1) / 2) * 300_000) for k in range(n_st)]
    ch = mk_channelizer(cfg, wide_fs, offs, fold=True)
    bank = ChannelBank(rx, n_st)

    rng = np.random.default_rng(13)
    nseg = cfg.block_size_iq * ch.decim
    iw = jnp.asarray(rng.standard_normal(nseg).astype(np.float32) * 0.2)
    qw = jnp.asarray(rng.standard_normal(nseg).astype(np.float32) * 0.2)
    cs_a, bs_a = ch.init_state(), bank.init_state()
    bs_b = bank.init_state()
    bs_a, out_a, cs_a = bank.run_channelized(bs_a, ch, iw, qw, cs_a)
    u8, _ = ch.call_u8(iw, qw, ch.init_state())
    bs_b, out_b = bank.run_segment(bs_b, u8)
    for la, lb in zip(jax.tree_util.tree_leaves((out_a, bs_a)),
                      jax.tree_util.tree_leaves((out_b, bs_b))):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_chan_epilogue_kernel_byte_exact():
    """The Mosaic fold-epilogue kernel (interpret mode) vs the NumPy
    reference of the XLA 4-D epilogue on the same y: the transpose,
    slicing and int32 byte packing must be EXACT (any packing/order bug
    shows as gross byte scatter); the rotation multiply-add may contract
    to FMA under compilation, so quantization boundaries may flip by 1
    u8 LSB at a tiny fraction of samples (-48 dB, far below every
    product floor). The compiled kernel matched NumPy byte-for-byte on
    v5e (2026-08-20)."""
    from real_time_sdr_tpu.ops.pallas.chan_epilogue import (
        fold_epilogue_u8, reference_u8, eligible)

    s_ch, r_n, c = 64, 16, 512
    assert eligible(r_n, s_ch, c)
    rng = np.random.default_rng(7)
    y = rng.standard_normal((c, r_n * 2 * s_ch)).astype(np.float32)
    pc = np.cos(rng.uniform(0, 7, s_ch)).astype(np.float32)
    ps = np.sin(rng.uniform(0, 7, s_ch)).astype(np.float32)
    n_out = c * r_n - 37       # exercise the partial-frame slice
    got = np.asarray(
        fold_epilogue_u8(jnp.asarray(y), jnp.asarray(pc),
                         jnp.asarray(ps), r_n, s_ch, n_out,
                         interpret=True)).astype(np.int32)
    ref = reference_u8(y, pc, ps, r_n, s_ch, n_out).astype(np.int32)
    diff = np.abs(got - ref)
    assert diff.max() <= 1, diff.max()            # FMA-boundary flips only
    assert (diff != 0).mean() < 0.01, (diff != 0).mean()


def test_call_u8_kernel_epilogue_integration():
    """call_u8 with the Mosaic epilogue (RTSDR_CHAN_EPI=interpret, CPU)
    vs the XLA epilogue on a REAL 64-station channelizer — same
    instance, same weights and plan pads; only the epilogue differs.
    Agreement to 1 u8 LSB (FMA contraction of the rotation), identical
    carried state."""
    import os as _os
    from conftest import mk_channelizer

    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    wide_fs = 8 * cfg.rf_fs
    n_st = 64
    offs = [int((k - (n_st - 1) / 2) * 300_000) for k in range(n_st)]
    _os.environ["RTSDR_CHAN_EPI"] = "interpret"
    try:
        ch = mk_channelizer(cfg, wide_fs, offs, fold=True)
    finally:
        del _os.environ["RTSDR_CHAN_EPI"]
    assert ch._fold_static and ch._fold_kernel == "interpret"

    rng = np.random.default_rng(21)
    nseg = cfg.block_size_iq * ch.decim
    iw = jnp.asarray(rng.standard_normal(nseg).astype(np.float32) * 0.2)
    qw = jnp.asarray(rng.standard_normal(nseg).astype(np.float32) * 0.2)
    u8_k, st_k = ch.call_u8(iw, qw, ch.init_state())
    kernel_plan = ch._fold_plan(int(iw.shape[-1]))
    ch._fold_kernel = None     # same instance -> same weights
    ch._fold_plan_cache[int(iw.shape[-1])] = kernel_plan  # same pads too
    u8_x, st_x = ch.call_u8(iw, qw, ch.init_state())
    diff = np.abs(np.asarray(u8_k).astype(np.int32)
                  - np.asarray(u8_x).astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 0.01, (diff != 0).mean()
    np.testing.assert_array_equal(np.asarray(st_k.pos), np.asarray(st_x.pos))


@pytest.mark.parametrize("fold", [True, False])
def test_sharded_wideband_matches_unsharded(fold):
    """ShardedWideband (channelizer + bank in ONE mesh computation,
    station axis sharded over 8 devices) must equal the unsharded
    channelize->decode chain: audio to f32 tolerance, RDS bit decisions
    bit-exact — in BOTH channelizer modes (folded-tone and
    mix-then-filter), across two carried-state segments."""
    from conftest import mk_channelizer
    from real_time_sdr_tpu.parallel.wideband import ShardedWideband

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    n_st = 8
    offs = [int((k - (n_st - 1) / 2) * 300_000) for k in range(n_st)]
    ch = mk_channelizer(cfg, wide_fs, offs, fold)

    rng = np.random.default_rng(11)
    nseg = 2 * cfg.block_size_iq * ch.decim
    iw = rng.standard_normal(2 * nseg).astype(np.float32) * 0.2
    qw = rng.standard_normal(2 * nseg).astype(np.float32) * 0.2

    mesh = Mesh(np.array(jax.devices()), ("ch",))
    sw = ShardedWideband(ch, rx, mesh)
    cs, bs = sw.init_state()
    # every station-major leaf must actually BE sharded over the mesh
    leaf = jax.tree_util.tree_leaves(bs)[0]
    assert len(leaf.sharding.device_set) == 8, leaf.sharding

    cs_u, bs_u = ch.init_state(), rx.init_state(batch=(n_st,))
    step_u = jax.jit(lambda c, b, i, q: (lambda r: (r[1], *jax.vmap(
        rx.run_segment)(b, ch.to_uint8(*r[0]))))(ch(i, q, c)))

    for seg in (slice(0, nseg), slice(nseg, 2 * nseg)):
        cs, bs, out = sw.step(cs, bs, iw[seg], qw[seg])
        cs_u, bs_u, out_u = step_u(cs_u, bs_u, jnp.asarray(iw[seg]),
                                   jnp.asarray(qw[seg]))
        a, b = np.asarray(out.left), np.asarray(out_u.left)
        snr = 10 * np.log10(np.mean(b ** 2) /
                            (np.mean((a - b) ** 2) + 1e-30))
        assert snr > 70, f"{seg}: sharded audio diverges {snr:.1f} dB"
        np.testing.assert_array_equal(np.asarray(out.rds_nbits),
                                      np.asarray(out_u.rds_nbits))
        np.testing.assert_array_equal(np.asarray(out.rds_bits),
                                      np.asarray(out_u.rds_bits))
