"""Parity tests for the STFT/mel frontend against the torch reference math.

The torch side is reconstructed from the publicly documented operations the
reference uses (torch.stft + hann window + librosa slaney mel), not copied.
"""
import numpy as np
import pytest
import torch

from detail_tts_tpu.audio import mel as jmel

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below


def torch_spectrogram(y: torch.Tensor, n_fft=1024, hop=256, win=1024):
    """torch.stft magnitude exactly as the reference computes it
    (vqvae/utils/data_utils.py:51-86)."""
    window = torch.hann_window(win)
    pad = (n_fft - hop) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win, window=window,
                      center=False, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6)


def test_spectrogram_matches_torch(np_rng):
    y = np_rng.standard_normal((2, 4096)).astype(np.float32) * 0.3
    ours = np.asarray(jmel.spectrogram(y))  # (B, frames, bins)
    theirs = torch_spectrogram(torch.from_numpy(y)).numpy()  # (B, bins, frames)
    assert ours.shape == (2, theirs.shape[2], theirs.shape[1])
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 1), rtol=2e-3, atol=2e-4)


def test_frame_count_formula():
    for n in [2560, 10240, 24000]:
        y = np.zeros((1, n), np.float32)
        spec = jmel.spectrogram(y)
        assert spec.shape[1] == jmel.num_frames(n)
    # hop-aligned signals give exactly L/hop frames (dataset alignment relies
    # on this, vqvae/dataset_24k.py:155)
    assert jmel.num_frames(10240) == 40


def test_mel_filterbank_properties():
    fb = jmel.mel_filterbank(24000, 1024, 128)
    assert fb.shape == (128, 513)
    assert (fb >= 0).all()
    # every filter has some support; triangles overlap neighbours
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalisation: peak of each filter roughly 2/bandwidth -> the
    # filter areas (in Hz) are approximately equal
    df = 24000 / 2 / 512
    areas = fb.sum(axis=1) * df
    assert areas.std() / areas.mean() < 0.25


def test_mel_filterbank_matches_librosa():
    librosa = pytest.importorskip("librosa")

    fb = jmel.mel_filterbank(24000, 1024, 128)
    ref = librosa.filters.mel(sr=24000, n_fft=1024, n_mels=128, fmin=0.0, fmax=None)
    np.testing.assert_allclose(fb, ref, atol=1e-6)


def test_mel_normalization_roundtrip(np_rng):
    x = np_rng.uniform(-11.5, 2.6, (4, 10, 128)).astype(np.float32)
    rt = np.asarray(jmel.denormalize_mel(jmel.normalize_mel(x)))
    np.testing.assert_allclose(rt, x, rtol=1e-5, atol=1e-5)


def test_mel_spectrogram_shape_and_dtype(np_rng):
    fe = jmel.MelFrontend()
    y = np_rng.standard_normal((1, 24000)).astype(np.float32) * 0.1
    m = fe.mel_spectrogram(y)
    assert m.shape == (1, jmel.num_frames(24000), 128)
    assert m.dtype == np.float32
    # log compression bounds: log(1e-5) is the floor
    assert float(m.min()) >= np.log(1e-5) - 1e-4
