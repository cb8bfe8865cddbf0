"""real_time_sdr_tpu: a TPU-native (JAX/XLA/Pallas) FM broadcast receiver
framework — mono/stereo audio + RDS decoding — with the full capability
surface of the reference real-time-SDR project, re-designed TPU-first.

Layers (see SURVEY.md for the reference layer map):
  config    — mode presets + derived static shapes
  ops       — DSP kernel library (FIR/polyphase, discriminator, PLL, PSD)
  models    — receiver chains (frontend, mono, stereo, RDS) as pure
              (state, block) -> (state, outputs) functions
  parallel  — channel-bank and time-axis sharding over a jax Mesh
  utils     — host I/O, streaming runtime bindings, observability
"""

from real_time_sdr_tpu.config import ReceiverConfig, mode_config

__all__ = ["ReceiverConfig", "mode_config"]
__version__ = "0.1.0"
