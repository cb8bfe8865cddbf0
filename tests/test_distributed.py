"""Multi-process (2-host emulation) channel-bank execution over
``jax.distributed`` — proves the parallel.distributed helpers end-to-end.

The reference is strictly single-host (SURVEY.md section 5); this is the
framework's N>=2-host scaling story: each process feeds only its own channel
rows (``host_channel_slice`` + ``make_global_channel_array``) and the bank
step runs SPMD over the global mesh. Two subprocesses on localhost with a
TCP coordinator, 2 CPU devices each -> a 4-device global mesh.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import sys
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.parallel import distributed as D
    from real_time_sdr_tpu.parallel.channel import ChannelBank
    from real_time_sdr_tpu.utils import synth

    D.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    mesh = D.channel_mesh()

    rx = Receiver(0, stereo=True, rds=False)
    C = 4
    iq, _ = synth.station_iq(rx.cfg, 1)   # deterministic on both hosts
    rows = np.stack([np.roll(iq, 2 * 997 * c) for c in range(C)])
    sl = D.host_channel_slice(C)
    assert sl == slice(2 * pid, 2 * pid + 2), sl
    garr = D.make_global_channel_array(mesh, rows[sl])

    bank = ChannelBank(rx, C, mesh=mesh)
    state = bank.init_state()
    state, out = bank.step(state, garr)

    # every process saves ITS addressable output shards + the local
    # single-device reference for those channels
    for shard in out.left.addressable_shards:
        c0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        for j in range(got.shape[0]):
            c = c0 + j
            s1 = rx.init_state()
            _, ref = rx.jit_step(s1, rows[c])
            ref = np.asarray(ref.left)
            snr = 10 * np.log10(np.mean(ref ** 2) /
                                (np.mean((ref - got[j]) ** 2) + 1e-30))
            assert snr > 80, f"ch {c}: {snr:.1f} dB"
    print(f"WORKER_OK {pid}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_channel_bank(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\n{err[-2000:]}"
        assert f"WORKER_OK {pid}" in out


_WORKER_TIME = textwrap.dedent("""
    import sys
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    from jax.sharding import Mesh
    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.parallel import distributed as D
    from real_time_sdr_tpu.parallel.time_shard import time_sharded_run
    from real_time_sdr_tpu.utils import synth

    D.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4
    mesh = Mesh(np.array(jax.devices()), ("time",))

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    B = 8
    iq, _ = synth.station_iq(rx.cfg, B, ps_name="2PROC-TS")
    blocks = np.asarray(iq).reshape(B, -1)
    # each process feeds only ITS half of the timeline; the exact-mode
    # ppermute halo then crosses the process boundary over DCN
    sl = D.host_channel_slice(B)
    garr = D.make_global_channel_array(mesh, blocks[sl], axis="time")
    outs = time_sharded_run(rx, mesh, garr, overlap=1)

    _, seq = rx.jit_run_blocks(rx.init_state(), jax.device_put(blocks))
    ref_bits = np.asarray(seq.rds_bits)
    ref_n = np.asarray(seq.rds_nbits)
    ref_left = np.asarray(seq.left)
    for shard in outs.left.addressable_shards:
        b0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        for j in range(got.shape[0]):
            ref = ref_left[b0 + j]
            snr = 10 * np.log10(np.mean(ref ** 2) /
                                (np.mean((ref - got[j]) ** 2) + 1e-30))
            assert snr > 100, f"block {b0+j}: {snr:.1f} dB"
    for shard in outs.rds_bits.addressable_shards:
        b0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        assert (got == ref_bits[b0:b0 + got.shape[0]]).all()
    for shard in outs.rds_nbits.addressable_shards:
        b0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        assert (got == ref_n[b0:b0 + got.shape[0]]).all()
    print(f"WORKER_OK {pid}", flush=True)
""")


@pytest.mark.slow
def test_two_process_time_sharding(tmp_path):
    """Exact time sharding with the ppermute halo ring crossing a PROCESS
    boundary (2 procs x 2 devices); RDS bit-identical per addressable
    shard (VERDICT r2 #4)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_TIME, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\n{err[-2000:]}"
        assert f"WORKER_OK {pid}" in out


_WORKER_JOINT = textwrap.dedent("""
    import sys
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.parallel import distributed as D
    from real_time_sdr_tpu.parallel.time_shard import time_sharded_run_bank
    from real_time_sdr_tpu.utils import synth

    D.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4
    # (ch, time) 2-D mesh: each PROCESS owns one channel row, so the
    # time-axis ppermute halos stay intra-process while the channel
    # shards live on different hosts
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2), ("ch", "time"))

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    B = 4
    iq_a, _ = synth.station_iq(rx.cfg, B, ps_name="JOINT2PA")
    iq_b, _ = synth.station_iq(rx.cfg, B, ps_name="JOINT2PB",
                               tone_left=700.0, tone_right=1600.0)
    rows = np.stack([np.asarray(iq_a).reshape(B, -1),
                     np.asarray(iq_b).reshape(B, -1)])  # (2, B, blk)
    # each process feeds ITS channel row (host boundary on the ch axis)
    local = rows[pid:pid + 1]
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("ch", "time")), local)
    outs = time_sharded_run_bank(rx, mesh, garr, overlap=1)

    # per-process oracle: the sequential receiver on THIS host's channel
    _, seq = rx.jit_run_blocks(rx.init_state(),
                               jax.device_put(rows[pid]))
    ref_left = np.asarray(seq.left)
    ref_bits = np.asarray(seq.rds_bits)
    ref_n = np.asarray(seq.rds_nbits)
    checked = 0
    for shard in outs.left.addressable_shards:
        c0 = shard.index[0].start or 0
        b0 = shard.index[1].start or 0
        got = np.asarray(shard.data)
        assert c0 == pid, (c0, pid)
        for j in range(got.shape[1]):
            ref = ref_left[b0 + j]
            snr = 10 * np.log10(np.mean(ref ** 2) /
                                (np.mean((ref - got[0, j]) ** 2) + 1e-30))
            assert snr > 100, f"ch {c0} blk {b0+j}: {snr:.1f} dB"
            checked += 1
    assert checked > 0
    for shard in outs.rds_bits.addressable_shards:
        c0 = shard.index[0].start or 0
        b0 = shard.index[1].start or 0
        if c0 != pid:
            continue  # replicated-or-local layout may expose both rows
        got = np.asarray(shard.data)
        assert (got[0] == ref_bits[b0:b0 + got.shape[1]]).all()
    print(f"WORKER_OK {pid}", flush=True)
""")


@pytest.mark.slow
def test_two_process_joint_channel_time_sharding(tmp_path):
    """JOINT (ch, time) sharding with the channel axis crossing a PROCESS
    boundary: each host feeds its own station rows while every channel's
    block stream is ALSO time-sharded (exact mode, bit-identical RDS per
    addressable shard)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_JOINT, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\n{err[-2000:]}"
        assert f"WORKER_OK {pid}" in out


_WORKER_WIDEBAND = textwrap.dedent("""
    import sys
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    from jax.sharding import Mesh
    from real_time_sdr_tpu.models.channelizer import Channelizer
    from real_time_sdr_tpu.models.receiver import Receiver
    from real_time_sdr_tpu.parallel import distributed as D
    from real_time_sdr_tpu.parallel.wideband import ShardedWideband

    D.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4
    mesh = Mesh(np.array(jax.devices()), ("ch",))

    rx = Receiver(0, stereo=True, rds=True, pll_tier=3)
    cfg = rx.cfg
    wide_fs = 4 * cfg.rf_fs
    offs = [-1_700_000, -600_000, 800_000, 2_300_000]
    ch = Channelizer(cfg, wide_fs, offs)
    rng = np.random.default_rng(17)   # identical capture on both procs
    n = cfg.block_size_iq * ch.decim
    iw = rng.standard_normal(n).astype(np.float32) * 0.2
    qw = rng.standard_normal(n).astype(np.float32) * 0.2

    sw = ShardedWideband(ch, rx, mesh)
    cs, bs = sw.init_state()
    cs, bs, out = sw.step(cs, bs, iw, qw)

    # local unsharded oracle for the channels THIS process holds
    import jax.numpy as jnp
    cs_u, bs_u = ch.init_state(), rx.init_state(batch=(len(offs),))
    (i_ds, q_ds), _ = ch(jnp.asarray(iw), jnp.asarray(qw), cs_u)
    _, out_u = jax.vmap(rx.run_segment)(bs_u, ch.to_uint8(i_ds, q_ds))
    ref_left = np.asarray(out_u.left)
    ref_bits = np.asarray(out_u.rds_bits)
    checked = 0
    for shard in out.left.addressable_shards:
        c0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        for j in range(got.shape[0]):
            ref = ref_left[c0 + j]
            snr = 10 * np.log10(np.mean(ref ** 2) /
                                (np.mean((ref - got[j]) ** 2) + 1e-30))
            assert snr > 70, f"st {c0+j}: {snr:.1f} dB"
            checked += 1
    assert checked == 2, checked   # 4 stations over 2 procs
    for shard in out.rds_bits.addressable_shards:
        c0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        assert (got == ref_bits[c0:c0 + got.shape[0]]).all()

    # FUSED frontend over the same mesh/capture (the single-chip wideband
    # serving default): shard_map on the weight columns, no collectives
    from real_time_sdr_tpu.models.wideband_frontend import (
        FusedWidebandFrontend)
    from real_time_sdr_tpu.parallel.wideband import ShardedFusedWideband
    wf = FusedWidebandFrontend(cfg, wide_fs, offs)
    sf = ShardedFusedWideband(wf, rx, mesh)
    ws, bs2 = sf.init_state()
    ws, bs2, out_f = sf.step(ws, bs2, iw, qw)
    demod_u, _ = wf(jnp.asarray(iw), jnp.asarray(qw), wf.init_state())
    _, out_fu = jax.vmap(rx.run_segment_demod)(
        rx.init_state(batch=(len(offs),)), demod_u)
    ref_left_f = np.asarray(out_fu.left)
    ref_bits_f = np.asarray(out_fu.rds_bits)
    checked = 0
    for shard in out_f.left.addressable_shards:
        c0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        for j in range(got.shape[0]):
            ref = ref_left_f[c0 + j]
            snr = 10 * np.log10(np.mean(ref ** 2) /
                                (np.mean((ref - got[j]) ** 2) + 1e-30))
            assert snr > 70, f"fused st {c0+j}: {snr:.1f} dB"
            checked += 1
    assert checked == 2, checked
    for shard in out_f.rds_bits.addressable_shards:
        c0 = shard.index[0].start or 0
        got = np.asarray(shard.data)
        assert (got == ref_bits_f[c0:c0 + got.shape[0]]).all()
    print(f"WORKER_OK {pid}", flush=True)
""")


@pytest.mark.slow
def test_two_process_sharded_wideband(tmp_path):
    """Channelized wideband serving over a 2-process mesh: one replicated
    capture, the station axis (channelizer output + bank) sharded across
    processes; per-shard audio + bit-exact RDS vs the unsharded chain
    (VERDICT r3 #4)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_WIDEBAND, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} rc={rc}\n{err[-2000:]}"
        assert f"WORKER_OK {pid}" in out
