"""STFT / mel-spectrogram frontend, jittable JAX.

Numerically matches the reference PyTorch frontend
(vqvae/utils/data_utils.py:51-155 == vqvae/modules/mel_processing.py:40-83):

* reflect pre-pad of ``(n_fft - hop) // 2`` samples on both sides, then
  ``torch.stft(center=False)`` with a Hann window,
* magnitude ``sqrt(re^2 + im^2 + 1e-6)``,
* librosa Slaney-scale mel filterbank (fmin=0, fmax=sr/2),
* log compression ``log(clamp(x, 1e-5))``.

The filterbank is re-derived from the public Slaney auditory-toolbox formula
(linear below 1 kHz, log above; filters area-normalised by 2/bandwidth) so no
librosa dependency is needed.  The whole pipeline is fp32 regardless of the
surrounding compute policy: spectral features are one of the precision
islands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Mel-code rate: one VQ code per 4 mel frames (vqvae/model_24k.py:606-615).
FRAMES_PER_CODE = 4

# Log-mel normalisation constants (vqvae/model_24k.py:501-503).
MEL_MIN = -11.512925465
MEL_MAX = 2.7


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel equivalent, htk=False, norm="slaney")
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freqs: np.ndarray) -> np.ndarray:
    freqs = np.asarray(freqs, dtype=np.float64)
    mels = freqs / _F_SP
    log_region = freqs >= _MIN_LOG_HZ
    mels = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(freqs, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mels)
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freqs = mels * _F_SP
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mels - _MIN_LOG_MEL)), freqs)
    return freqs


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank, shape (n_mels, n_fft//2+1)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalisation.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def _hann_window(win_length: int) -> np.ndarray:
    # torch.hann_window(periodic=True) == 0.5 * (1 - cos(2 pi n / N))
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def num_frames(num_samples: int, n_fft: int = 1024, hop: int = 256) -> int:
    """Frame count produced by :func:`spectrogram` for a length-L signal."""
    pad = (n_fft - hop) // 2
    return 1 + (num_samples + 2 * pad - n_fft) // hop


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def spectrogram(y: jax.Array, n_fft: int = 1024, hop: int = 256,
                win: int = 1024) -> jax.Array:
    """Linear magnitude spectrogram.

    Args:
      y: waveform, shape (..., samples), float in [-1, 1].
    Returns:
      magnitudes, shape (..., frames, n_fft // 2 + 1), fp32.
    """
    y = y.astype(jnp.float32)
    pad = (n_fft - hop) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    n = 1 + (y.shape[-1] - n_fft) // hop

    # Gather overlapping frames: (..., n, n_fft).
    starts = np.arange(n) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = y[..., idx]

    window = jnp.asarray(_hann_window(win))
    if win < n_fft:  # torch zero-pads the window to n_fft centred
        lp = (n_fft - win) // 2
        window = jnp.pad(window, (lp, n_fft - win - lp))
    frames = frames * window

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)
    return mag


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jax.Array) -> jax.Array:
    return jnp.exp(x)


class MelFrontend:
    """Precomputes the filterbank; exposes jitted spec/mel transforms.

    Output layout is time-major (..., frames, channels) — the TPU-native
    layout used throughout this framework (the torch reference uses
    channels-first).
    """

    def __init__(self, sr: int = 24000, n_fft: int = 1024, hop: int = 256,
                 win: int = 1024, n_mels: int = 128, fmin: float = 0.0,
                 fmax: float | None = None):
        self.sr, self.n_fft, self.hop, self.win, self.n_mels = sr, n_fft, hop, win, n_mels
        self.mel_basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

    def linear_spectrogram(self, y: jax.Array) -> jax.Array:
        """(..., samples) -> (..., frames, n_fft//2+1)."""
        return spectrogram(y, self.n_fft, self.hop, self.win)

    def spec_to_mel(self, spec: jax.Array) -> jax.Array:
        """(..., frames, n_fft//2+1) -> (..., frames, n_mels) log-mel."""
        mel = spec @ self.mel_basis.T
        return dynamic_range_compression(mel)

    def mel_spectrogram(self, y: jax.Array) -> jax.Array:
        """(..., samples) -> (..., frames, n_mels) log-mel."""
        return self.spec_to_mel(self.linear_spectrogram(y))


def normalize_mel(mel: jax.Array) -> jax.Array:
    """Log-mel -> [-1, 1] (vqvae/model_24k.py:505)."""
    return 2.0 * ((mel - MEL_MIN) / (MEL_MAX - MEL_MIN)) - 1.0


def denormalize_mel(norm_mel: jax.Array) -> jax.Array:
    """[-1, 1] -> log-mel (vqvae/model_24k.py:508)."""
    return ((norm_mel + 1.0) / 2.0) * (MEL_MAX - MEL_MIN) + MEL_MIN
