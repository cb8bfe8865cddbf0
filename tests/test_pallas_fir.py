"""Pallas FIR kernel parity (interpret mode on CPU).

The phase-plane tap-loop kernel (ops/pallas/fir_kernels.py) is the
optimal-FLOP formulation; on current hardware the framed MXU matmul wins
end-to-end (the MXU's throughput dwarfs the structural-zero waste), so the
production path uses ops/fir.py — this test keeps the kernel correct for
hardware where the balance flips.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from golden import dsp
from real_time_sdr_tpu.ops.pallas.fir_kernels import fir_decimate_planes


@pytest.mark.parametrize("down", [1, 5, 10])
def test_pallas_fir_matches_golden(down):
    rng = np.random.default_rng(1)
    K, N, C = 101, 2560, 2
    h = rng.standard_normal(K)
    x = rng.standard_normal((C, N)).astype(np.float32)
    tail = rng.standard_normal((C, K - 1)).astype(np.float32)
    xx = jnp.asarray(np.concatenate([tail, x], -1))
    y = fir_decimate_planes(xx, tuple(h.tolist()), down, interpret=True)
    for c in range(C):
        g, _ = dsp.fir_block(x[c], h, tail[c].astype(np.float64), down)
        np.testing.assert_allclose(np.asarray(y)[c], g, atol=5e-5)
