"""PSD observability parity + state checkpoint round trip."""

import numpy as np
import jax.numpy as jnp

from real_time_sdr_tpu.ops.spectrum import estimate_psd, freq_response
from real_time_sdr_tpu.ops import filters
from real_time_sdr_tpu.utils.state import save_state, load_state
from real_time_sdr_tpu.models.receiver import Receiver
from real_time_sdr_tpu.utils import synth


def golden_psd(samples, fs, nfft=512):
    """Loop-level Bartlett PSD (model/fmSupportLib.py:214-289 semantics:
    each segment converts to dB FIRST, then the dB values average — the
    round-5 cross-oracle caught this twin silently averaging linear
    power instead, the same deviation as the device path)."""
    n_seg = len(samples) // nfft
    window = np.sin(np.arange(nfft) * np.pi / nfft) ** 2
    acc = np.zeros(nfft // 2)
    for s in range(n_seg):
        seg = samples[s * nfft:(s + 1) * nfft] * window
        spec = np.fft.fft(seg)[: nfft // 2]
        psd = (np.abs(spec) ** 2) * 2.0 / (fs * nfft / 2.0)
        acc += 10 * np.log10(np.maximum(psd, 1e-30))
    return acc / n_seg


def test_estimate_psd_matches_golden():
    rng = np.random.default_rng(0)
    fs = 240e3
    t = np.arange(8192) / fs
    x = (np.sin(2 * np.pi * 19e3 * t)
         + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    freqs, psd = estimate_psd(jnp.asarray(x), fs)
    ref = golden_psd(x.astype(np.float64), fs)
    np.testing.assert_allclose(np.asarray(psd), ref, atol=0.1)
    # the 19 kHz tone is the peak
    assert abs(freqs[np.argmax(np.asarray(psd))] - 19e3) < 500


def test_freq_response_lowpass():
    h = filters.design_lpf(240e3, 16e3, 101)
    freqs, resp = freq_response(h, 240e3)
    assert resp[np.argmin(np.abs(freqs - 1e3))] > 0.9
    assert resp[np.argmin(np.abs(freqs - 60e3))] < 0.01


def test_state_checkpoint_roundtrip(tmp_path):
    rx = Receiver(0, stereo=True, rds=True)
    iq, _ = synth.station_iq(rx.cfg, 3)
    blocks = jnp.asarray(iq.reshape(3, -1))
    s = rx.init_state()
    for b in range(2):
        s, _ = rx.jit_step(s, blocks[b])
    path = str(tmp_path / "ck.npz")
    save_state(path, s)
    s2 = load_state(path, rx.init_state())
    # continuing from the restored state must equal continuing from live state
    sa, oa = rx.jit_step(s, blocks[2])
    sb, ob = rx.jit_step(s2, blocks[2])
    np.testing.assert_array_equal(np.asarray(oa.left), np.asarray(ob.left))
    np.testing.assert_array_equal(np.asarray(oa.rds_bits),
                                  np.asarray(ob.rds_bits))


def test_state_path_without_npz_suffix(tmp_path):
    # np.savez silently appends ".npz"; save/load must agree on the name so
    # CLI --checkpoint resume works for suffix-less paths.
    tree = {"a": jnp.arange(4, dtype=jnp.float32), "b": jnp.zeros((2, 3))}
    path = str(tmp_path / "ckpt")          # no suffix
    save_state(path, tree)
    assert (tmp_path / "ckpt.npz").exists()
    got = load_state(path, tree)
    np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(tree["a"]))
