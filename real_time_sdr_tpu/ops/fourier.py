"""Fourier transforms: thin production wrappers + reference-shaped API.

The reference carries a pedagogical ladder of hand transforms
(DFT O(N^2), recursive/iterative FFTs — src/fourier.cpp:14-215) used only
for PSD debugging and unit tests. The production kernel on TPU is XLA's FFT;
these wrappers keep the reference's API surface (dft/idft/fft names and
conventions) so its implementation-equivalence test strategy
(test/fft_unittest.cpp:53-90) carries over, without rebuilding an O(N^2)
DFT on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dft", "idft", "fft", "magnitude", "dft_naive"]


def dft(x: jax.Array) -> jax.Array:
    """Forward DFT, reference sign convention (src/fourier.cpp:14-22)."""
    return jnp.fft.fft(x)


def idft(x: jax.Array) -> jax.Array:
    """Inverse DFT with 1/N normalization (src/fourier.cpp:96-105)."""
    return jnp.fft.ifft(x)


def fft(x: jax.Array) -> jax.Array:
    """Alias of dft — XLA's FFT is the optimized path; the reference's
    FFT_recursive/FFT_improved/FFT_optimized ladder (src/fourier.cpp:136-215)
    exists to be equivalent to its DFT, which these wrappers are by
    construction (asserted in tests the same way)."""
    return jnp.fft.fft(x)


def magnitude(spectrum: jax.Array) -> jax.Array:
    """|X_k| (``computeVectorMagnitude``, src/fourier.cpp:25-32)."""
    return jnp.abs(spectrum)


def dft_naive(x: np.ndarray) -> np.ndarray:
    """Host-side O(N^2) direct DFT — the independent oracle the
    equivalence tests compare against (twin of src/fourier.cpp:14-22)."""
    x = np.asarray(x, dtype=np.complex128)
    n = len(x)
    k = np.arange(n)
    twiddle = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return twiddle @ x
