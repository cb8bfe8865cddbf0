"""PCM formatting: float audio -> int16 samples for `aplay`-style sinks.

Matches the reference's scaling and interleave exactly
(src/mono.cpp:40-42 ``static_cast<short>(16384*x)`` truncation toward zero;
src/stereo.cpp:100-107 even index = left, odd = right).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from real_time_sdr_tpu.config import AUDIO_SCALE


def _to_i16(x: jnp.ndarray) -> jnp.ndarray:
    # Clip before the cast: float->int16 overflow is implementation-defined
    # in XLA (and UB in the reference's static_cast) — loud transients would
    # otherwise wrap platform-dependently instead of saturating.
    return jnp.clip(x, -32768.0, 32767.0).astype(jnp.int16)


def mono_pcm(audio: jnp.ndarray) -> jnp.ndarray:
    """(..., N) float -> (..., N) int16, truncation toward zero."""
    return _to_i16(AUDIO_SCALE * audio)


def stereo_pcm(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """(..., N) x2 float -> (..., 2N) int16 interleaved L,R."""
    inter = jnp.stack([left, right], axis=-1)
    scaled = _to_i16(AUDIO_SCALE * inter)
    return scaled.reshape(scaled.shape[:-2] + (-1,))


def write_pcm(fileobj, pcm) -> None:
    np.asarray(pcm).astype("<i2").tofile(fileobj)
