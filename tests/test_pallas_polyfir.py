"""Pallas framed-FIR bank (ops.pallas.polyfir) vs the XLA PolyFIR path.

Interpret mode on CPU; the same kernel lowers through Mosaic on TPU (the
production path selected by ops.fir.make_bank). Geometry coverage mirrors
every bank the receiver builds: IF BPF triple (down=1), mode-0/1 audio
resamplers (down=5/9), the RDS 247/640 baseband bank, and the RRC.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.ops.fir import (PolyFIR, _XlaBank, make_bank,
                                       shared_frames_apply)
from real_time_sdr_tpu.ops.pallas.polyfir import (FramedFIRBank,
                                                  pallas_supported)

pytestmark = pytest.mark.smoke

_RNG = np.random.default_rng(7)


def _check(firs, n, batch=()):
    bank = FramedFIRBank(firs, interpret=True)
    x = jnp.asarray(_RNG.standard_normal(batch + (n,)), jnp.float32)
    tail = jnp.asarray(_RNG.standard_normal(batch + (firs[0].tail_len,)),
                       jnp.float32)
    if len(firs) == 1:
        y_ref, t_ref = firs[0](x, tail)
        y_ref = [y_ref]
    else:
        y_ref, t_ref = shared_frames_apply(firs, x, tail)
    y_p, t_p = bank(x, tail)
    for a, b in zip(y_ref, y_p):
        assert a.shape == b.shape
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-5 * scale
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_p))


def test_if_bpf_triple_shared_frames():
    fs = 240e3
    firs = [PolyFIR(filters.design_bpf(fs, 18.5e3, 19.5e3, 101)),
            PolyFIR(filters.design_bpf(fs, 22e3, 54e3, 101)),
            PolyFIR(filters.design_bpf(fs, 54e3, 60e3, 101))]
    assert pallas_supported(firs)
    _check(firs, 7350, batch=(3,))


def test_audio_decimator_mode0():
    h = filters.design_lpf(240e3, 16e3, 101)
    _check([PolyFIR(h, up=1, down=5)], 7350 * 4)


def test_audio_decimator_mode1():
    h = filters.design_lpf(360e3, 16e3, 101)
    _check([PolyFIR(h, up=1, down=9)], 360 * 49)


def test_rds_baseband_247_640():
    h = filters.design_lpf(240e3 * 247, 3e3, 101 * 247, gain=247)
    _check([PolyFIR(h, up=247, down=640)], 7350, batch=(2,))


def test_rrc_multibatch():
    rrc = filters.design_rrc(92625, 101, symbol_rate=2375, beta=0.9)
    _check([PolyFIR(rrc)], 2836, batch=(2, 3))


def test_unsupported_geometries_fall_back():
    # mode-2 audio bank: stride 800 is not lane-aligned
    h2 = filters.design_lpf(240e3 * 147, 16e3, 101 * 147, gain=147)
    assert not pallas_supported([PolyFIR(h2, up=147, down=800)])
    # single-tap delay lowers to a slice, not a matmul
    assert not pallas_supported([PolyFIR(filters.design_apf(101))])
    # mixed geometries cannot share frames
    a = PolyFIR(filters.design_lpf(240e3, 16e3, 101))
    b = PolyFIR(filters.design_lpf(240e3, 16e3, 101), up=1, down=5)
    assert not pallas_supported([a, b])


def test_make_bank_dispatch(monkeypatch):
    firs = [PolyFIR(filters.design_lpf(240e3, 16e3, 101))]
    monkeypatch.delenv("RTSDR_FIR", raising=False)
    assert isinstance(make_bank(firs), _XlaBank)          # CPU default
    assert isinstance(make_bank(firs, impl="pallas_interpret"),
                      FramedFIRBank)
    monkeypatch.setenv("RTSDR_FIR", "pallas_interpret")
    assert isinstance(make_bank(firs), FramedFIRBank)
    # unsupported geometry falls back even when pallas requested
    h2 = filters.design_lpf(240e3 * 147, 16e3, 101 * 147, gain=147)
    assert isinstance(
        make_bank([PolyFIR(h2, up=147, down=800)], impl="pallas"),
        _XlaBank)
