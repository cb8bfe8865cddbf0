"""golden.chain.run_stages: whole-capture per-stage oracle signals.

Shape/rate contract plus device parity at the stages the viz --golden
overlay consumes (the per-panel SNR numbers must mean what they claim)."""

import numpy as np
import jax.numpy as jnp
import pytest

from golden.chain import run_stages
from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.utils import synth
from real_time_sdr_tpu.utils.viz import snr_db

pytestmark = pytest.mark.smoke


def test_run_stages_rates_and_device_parity():
    rx = Receiver(0, stereo=True, rds=True, pll_tier=1)
    cfg = rx.cfg
    nb = 3
    iq, _ = synth.station_iq(cfg, nb, ps_name="CHAINTST")
    gold = run_stages(cfg, iq)

    assert set(gold) == {"demod", "pilot", "carrier", "left", "right",
                         "rds_band", "rds_mixed", "rds_clean"}
    assert len(gold["demod"]) == nb * cfg.if_block
    assert len(gold["left"]) == nb * cfg.audio_block
    assert len(gold["rds_clean"]) == nb * cfg.rds_block

    state = rx.init_state()
    blk = 2 * cfg.block_size_iq
    left, clean = [], []
    for b in range(nb):
        state, out = rx.jit_step(state, jnp.asarray(iq[b * blk:(b + 1) * blk]))
        left.append(np.asarray(out.left))
        clean.append(np.asarray(out.rds_clean))
    # skip the PLL acquisition block, then the oracle and device agree
    assert snr_db(gold["left"][cfg.audio_block:],
                  np.concatenate(left)[cfg.audio_block:]) > 40
    assert snr_db(gold["rds_clean"][cfg.rds_block:],
                  np.concatenate(clean)[cfg.rds_block:]) > 40


def test_run_stages_mono_only():
    rx = Receiver(0, stereo=False, rds=False)
    cfg = rx.cfg
    iq, _ = synth.station_iq(cfg, 2)
    gold = run_stages(cfg, iq, stereo=False, rds=False)
    assert set(gold) == {"demod", "mono"}
    assert len(gold["mono"]) == 2 * cfg.audio_block
