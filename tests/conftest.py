"""Test harness config: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware.

Note: the session environment ships an `axon` TPU PJRT plugin that merges
itself into `jax_platforms` even when JAX_PLATFORMS=cpu is exported, so the
override must go through jax.config *before* backend initialization.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(items):
    """Everything not marked slow is the smoke set: `-m smoke` keeps the
    inner loop to a few minutes; `pytest tests/ -q` still runs it all."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to the XLA flag
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


def mk_channelizer(cfg, wide_fs, offs, fold: bool):
    """Construct a Channelizer with the fold mode pinned via its env knob
    (read once at __init__); shared by the channelizer/parallel suites."""
    import os
    from real_time_sdr_tpu.models.channelizer import Channelizer

    key = "RTSDR_CHAN_FOLD"
    old = os.environ.get(key)
    os.environ[key] = "1" if fold else "0"
    try:
        ch = Channelizer(cfg, wide_fs, offs)
    finally:
        if old is None:
            del os.environ[key]
        else:
            os.environ[key] = old
    assert ch.fold == fold
    return ch
