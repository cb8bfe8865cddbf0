"""Chain-level parity: the jitted receiver vs the loop-level float64 oracle,
block by block with carried state (the framework's equivalent of the
reference's fm_demod_<k>.bin cross-validation protocol,
model/fmMonoBlock.py:139-141 + src/iofunc.cpp:31-48).

The oracle loop lives in golden/chain.py — the SAME code the viz --golden
overlay renders — so the parity gates here and the diagnostic figures can
never drift apart.
"""

import numpy as np
import jax
import jax.numpy as jnp

from golden.chain import run_stages
from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.utils import synth
from real_time_sdr_tpu.utils.viz import snr_db


def _per_block(arr, block):
    arr = np.asarray(arr)
    return arr.reshape(-1, block)


def test_mono_chain_matches_golden_blocks():
    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    n_blocks = 3
    iq, _ = synth.station_iq(cfg, n_blocks, tone_left=700.0,
                             tone_right=700.0)
    gold = _per_block(run_stages(cfg, iq, stereo=False, rds=False)["mono"],
                      cfg.audio_block)

    state = rx.init_state()
    blk = 2 * cfg.block_size_iq
    for b in range(n_blocks):
        state, out = rx.jit_step(state, jnp.asarray(iq[b * blk:(b + 1) * blk]))
        assert snr_db(gold[b], np.asarray(out.mono)) > 60, f"block {b}"


def test_stereo_chain_matches_golden_blocks():
    rx = Receiver(0, stereo=True, rds=False, pll_tier=1)
    cfg = rx.cfg
    n_blocks = 3
    iq, _ = synth.station_iq(cfg, n_blocks, tone_left=500.0,
                             tone_right=1500.0)
    gold = _per_block(run_stages(cfg, iq, stereo=True, rds=False)["left"],
                      cfg.audio_block)

    state = rx.init_state()
    blk = 2 * cfg.block_size_iq
    for b in range(n_blocks):
        state, out = rx.jit_step(state, jnp.asarray(iq[b * blk:(b + 1) * blk]))
        if b > 0:  # skip the acquisition-transient block
            assert snr_db(gold[b], np.asarray(out.left)) > 40, f"block {b}"


def test_rds_chain_clean_matches_golden_blocks():
    rx = Receiver(0, stereo=False, rds=True, pll_tier=1)
    cfg = rx.cfg
    n_blocks = 3
    iq, _ = synth.station_iq(cfg, n_blocks)
    gold = _per_block(
        run_stages(cfg, iq, stereo=False, rds=True)["rds_clean"],
        cfg.rds_block)

    # run Frontend + RdsPath standalone to expose `clean`
    from real_time_sdr_tpu.models.frontend import Frontend
    from real_time_sdr_tpu.models.rds import RdsPath
    fe = Frontend(cfg)
    rp = RdsPath(cfg, pll_tier=1)
    fs_, rs_ = fe.init_state(), rp.init_state()
    blk = 2 * cfg.block_size_iq
    for b in range(n_blocks):
        u8 = jnp.asarray(iq[b * blk:(b + 1) * blk])
        demod_dev, fs_ = jax.jit(fe.__call__)(u8, fs_)
        (_, _, clean_dev), rs_ = jax.jit(rp.__call__)(demod_dev, rs_)
        if b > 0:
            assert snr_db(gold[b], np.asarray(clean_dev)) > 40, f"block {b}"
