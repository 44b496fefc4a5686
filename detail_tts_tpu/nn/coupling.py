"""Normalizing-flow pieces: affine coupling + flip (modules.py:393-475), NTC.

The flow stack alternates mean-only ``ResidualCouplingLayer`` and ``Flip``;
forward and reverse are both closed-form so the whole block stays inside one
jit with no Python-level branching on traced values.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import Conv1d
from detail_tts_tpu.nn.wavenet import WN


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (modules.py:421-475)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 g: Optional[jax.Array] = None, reverse: bool = False) -> jax.Array:
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, gin_channels=self.gin_channels, name="enc")(h, x_mask, g=g)
        # post conv is zero-initialised in the reference (modules.py:453-454)
        m = Conv1d(half, 1, kernel_init=nn.initializers.zeros, name="post")(h) * x_mask
        # mean_only => logs == 0
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """4x (coupling + flip) (vqvae/model_24k.py:127-169)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 g: Optional[jax.Array] = None, reverse: bool = False) -> jax.Array:
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x = layer(x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)  # Flip over channels (modules.py:393)
        else:
            for layer in reversed(layers):
                x = jnp.flip(x, axis=-1)
                x = layer(x, x_mask, g=g, reverse=True)
        return x
