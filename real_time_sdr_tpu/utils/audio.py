"""PCM formatting: float audio -> int16 samples for `aplay`-style sinks.

Matches the reference's scaling and interleave exactly
(src/mono.cpp:40-42 ``static_cast<short>(16384*x)`` truncation toward zero;
src/stereo.cpp:100-107 even index = left, odd = right).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from real_time_sdr_tpu.config import AUDIO_SCALE


def mono_pcm(audio: jnp.ndarray) -> jnp.ndarray:
    """(..., N) float -> (..., N) int16, truncation toward zero."""
    return (AUDIO_SCALE * audio).astype(jnp.int16)


def stereo_pcm(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """(..., N) x2 float -> (..., 2N) int16 interleaved L,R."""
    inter = jnp.stack([left, right], axis=-1)
    scaled = (AUDIO_SCALE * inter).astype(jnp.int16)
    return scaled.reshape(scaled.shape[:-2] + (-1,))


def write_pcm(fileobj, pcm) -> None:
    np.asarray(pcm).astype("<i2").tofile(fileobj)
