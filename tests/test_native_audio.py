"""Native C++ audio runtime vs numpy/scipy references."""
import numpy as np
import pytest

from mosstts_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_resample_matches_scipy(lib):
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    wav = (np.sin(2 * np.pi * 440 * t) * 0.5 + rng.standard_normal(16000) * 0.01).astype(np.float32)
    out = native.resample_native(wav, 16000, 24000)
    from scipy.signal import resample_poly

    ref = resample_poly(wav, 3, 2).astype(np.float32)
    assert out.shape == ref.shape
    # interior samples agree closely (different windows -> small deltas)
    err = np.abs(out[500:-500] - ref[500:-500])
    assert float(err.mean()) < 5e-3, float(err.mean())


def test_crossfade_matches_numpy(lib):
    rng = np.random.default_rng(1)
    prev = rng.standard_normal(100).astype(np.float32)
    wav = rng.standard_normal(200).astype(np.float32)
    n = 40
    out = native.crossfade_native(prev, wav, n)
    fade_out = np.linspace(1.0, 0.0, n, dtype=np.float32)
    ref = np.concatenate([prev[:-n], prev[-n:] * fade_out + wav[:n] * (1 - fade_out), wav[n:]])
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pcm16_roundtrip(lib):
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(1000) * 0.3).clip(-1, 1).astype(np.float32)
    pcm = native.float_to_pcm16(wav)
    back = pcm.astype(np.float32) / 32767.0
    assert np.abs(back - wav).max() < 1e-3


def test_loudness_matches_numpy(lib):
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(4000) * 0.01).astype(np.float32)
    out = native.loudness_normalize_native(wav, -20.0)
    cur = 10.0 * np.log10(np.mean(wav**2) + 1e-9)
    gain = np.clip(-20.0 - cur, -3.0, 3.0)
    ref = wav * (10 ** (gain / 20.0))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-7)
