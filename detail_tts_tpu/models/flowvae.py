"""Flow-VAE components (VITS-style): prior/posterior encoders + flow.

Reference: vqvae/model_24k.py:71-218 (SpecEncoder, PosteriorEncoder) and
:127-169 (ResidualCouplingBlock, re-exported from nn.coupling).  NTC layout.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import Conv1d, Dense, sequence_mask
from detail_tts_tpu.nn.coupling import ResidualCouplingBlock  # noqa: F401 (re-export)
from detail_tts_tpu.nn.rel_attention import RelPosTransformerEncoder
from detail_tts_tpu.nn.wavenet import WN


class SpecEncoder(nn.Module):
    """Transformer prior encoder over mel features (model_24k.py:71-124)."""

    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    sample: bool = True

    @nn.compact
    def __call__(self, y: jax.Array, y_lengths: jax.Array,
                 g: Optional[jax.Array] = None, deterministic: bool = True):
        """y: (B, T, C_hidden-projected input); returns (y, m, logs) if sample."""
        y_mask = sequence_mask(y_lengths, y.shape[1])[..., None]
        if g is not None:
            y = y + Dense(self.hidden_channels, name="ge_proj")(g)[:, None, :]
        y = RelPosTransformerEncoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout, name="encoder",
        )(y * y_mask, y_mask, deterministic=deterministic)
        y = Conv1d(self.out_channels, 1, name="out_proj")(y)
        if not self.sample:
            return y
        stats = Conv1d(2 * self.out_channels, 1, name="proj")(y) * y_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return y, m, logs


class PosteriorEncoder(nn.Module):
    """WaveNet posterior over the linear spectrogram (model_24k.py:172-218)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    sample: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, x_lengths: jax.Array, rng: Optional[jax.Array] = None,
                 g: Optional[jax.Array] = None):
        """x: (B, T, in_channels).  Returns (z, m, logs) when sampling."""
        if g is not None:
            g = jax.lax.stop_gradient(g)  # reference detaches g (model_24k.py:207)
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None]
        x = Conv1d(self.hidden_channels, 1, name="pre")(x) * x_mask
        x = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels, name="enc")(
                   x, x_mask, g=g)
        if not self.sample:
            return x
        stats = Conv1d(2 * self.out_channels, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        eps = jax.random.normal(rng, m.shape, dtype=jnp.float32)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs
