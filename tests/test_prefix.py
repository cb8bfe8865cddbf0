"""ops.prefix.prefix_sum == cumsum up to f32 summation order, all shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

from real_time_sdr_tpu.ops.prefix import prefix_sum


@pytest.mark.parametrize("n", [7, 128, 1024, 1025, 4096, 88320])
def test_prefix_matches_cumsum(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)).astype(np.float32) * 0.05
    got = np.asarray(prefix_sum(jnp.asarray(x)))
    want = np.cumsum(x.astype(np.float64), axis=-1)
    # f32 tree accumulation vs f64 sequential: bounded relative error
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4 * np.sqrt(n))


def test_prefix_batch_dims():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 1500)).astype(np.float32)
    got = np.asarray(prefix_sum(jnp.asarray(x)))
    want = np.cumsum(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3)
