"""Native C++ wav loader vs scipy: decode and resample parity."""
import numpy as np
import pytest

from detail_tts_tpu.native import load_library, load_wav_native


def _have_native():
    return load_library() is not None


pytestmark = [pytest.mark.smoke,
              pytest.mark.skipif(not _have_native(),
                                reason="no g++ toolchain available")]


def test_load_wav_pcm16_no_resample(tmp_path):
    from scipy.io import wavfile

    sr = 24000
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, sr * 2).astype(np.float32)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))

    out = load_wav_native(path, sr)
    assert out is not None and out.shape == (sr * 2,)
    np.testing.assert_allclose(out, np.round(wav * 32767) / 32768.0,
                               atol=1e-4)


def test_resample_matches_scipy(tmp_path):
    import scipy.signal as sps
    from scipy.io import wavfile

    sr_in, sr_out = 44100, 24000
    t = np.arange(sr_in) / sr_in
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "b.wav")
    wavfile.write(path, sr_in, (wav * 32767).astype(np.int16))

    out = load_wav_native(path, sr_out)
    ref = sps.resample_poly(np.round(wav * 32767) / 32768.0, sr_out, sr_in)
    n = min(len(out), len(ref))
    # interior samples match scipy's polyphase tightly (edges differ by
    # padding convention)
    np.testing.assert_allclose(out[100 : n - 100], ref[100 : n - 100],
                               atol=5e-4)


def test_reference_asset_decodes():
    out = load_wav_native("/root/reference/1.wav", 24000)
    assert out is not None and len(out) > 24000
    assert np.all(np.isfinite(out))
    assert np.max(np.abs(out)) <= 1.0


def test_dataset_uses_native(tmp_path):
    from scipy.io import wavfile

    from detail_tts_tpu.data.dataset import read_wav

    sr = 16000
    wav = np.random.default_rng(1).uniform(-0.3, 0.3, sr).astype(np.float32)
    path = str(tmp_path / "c.wav")
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    out = read_wav(path, 24000)
    assert abs(len(out) - 24000) <= 2  # 1 s of 16 kHz audio at 24 kHz
