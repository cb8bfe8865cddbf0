"""Property test: PolyFIR plan math vs the golden loop oracle over random
(up, down, taps, block-length) geometries.

The framed-matmul plan (frame size, window span, weight banding,
tail-carry) is pure index arithmetic derived from src/filter.cpp:106-147;
the targeted tests pin the receiver's geometries, this one sweeps the
space so a plan-math regression can't hide in an untested corner. Two
consecutive blocks are checked so the overlap-save carry is exercised at
every geometry.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from golden import dsp
from real_time_sdr_tpu.ops.fir import PolyFIR, init_state

pytestmark = pytest.mark.smoke

_RNG = np.random.default_rng(42)


def _random_geometry(rng):
    up = int(rng.choice([1, 1, 1, 2, 3, 5, 7, 16, 49, 147, 247]))
    down = int(rng.choice([1, 2, 3, 5, 8, 9, 10, 13, 64, 640, 800, 1280]))
    taps = int(rng.choice([7, 31, 101, 151])) * (up if up > 1 else 1)
    # block length: a few frames' worth, multiple of down for clean counts
    n = int(rng.integers(4, 40)) * down * max(1, 128 // max(up, 1))
    return up, down, taps, n


@pytest.mark.parametrize("seed", range(12))
def test_polyfir_matches_golden_random_geometry(seed):
    rng = np.random.default_rng(1000 + seed)
    up, down, taps, n = _random_geometry(rng)
    h = rng.standard_normal(taps) / np.sqrt(taps)
    fir = PolyFIR(h, up=up, down=down)
    tail = init_state(taps, up)
    g_state = np.zeros(fir.tail_len)

    for block in range(2):  # second block exercises the carried tail
        x = rng.standard_normal(n)
        y_dev, tail = fir(jnp.asarray(x, jnp.float32), tail)
        if up == 1:
            # tail contract identical: last len(h)-1 inputs
            y_ref, g_state = dsp.fir_block(x, h, g_state, down)
        else:
            y_ref, g_state = dsp.fir_resample_block(x, h, g_state, up, down)
        y_dev = np.asarray(y_dev, np.float64)
        assert y_dev.shape == y_ref.shape, (up, down, taps, n)
        err = np.sqrt(np.mean((y_dev - y_ref) ** 2))
        scale = np.sqrt(np.mean(y_ref ** 2)) or 1.0
        snr = 20 * np.log10(scale / max(err, 1e-300))
        assert snr > 100, (up, down, taps, n, block, snr)
