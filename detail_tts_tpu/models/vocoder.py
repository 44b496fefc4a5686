"""HiFi-GAN V1-style waveform generator (vqvae/model_24k.py:221-295), NTC.

5 transposed-conv upsample stages [8,4,2,2,2] (total 256 = hop length),
3 averaged ResBlock1 branches per stage, global speaker conditioning via a
1x1 conv added after conv_pre.  Output: tanh waveform (B, T*256, 1).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import Conv1d, ConvTranspose1d, leaky_relu
from detail_tts_tpu.nn.resblocks import ResBlock1, ResBlock2


class HiFiGANGenerator(nn.Module):
    initial_channel: int
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (8, 4, 2, 2, 2)
    upsample_initial_channel: int = 400
    upsample_kernel_sizes: Sequence[int] = (16, 8, 2, 2, 2)
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, g: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, T, C); g: (B, gin).  Returns wav (B, T*prod(rates), 1)."""
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2

        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        if g is not None and self.gin_channels:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(
                g[:, None, :])

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            x = leaky_relu(x)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                weight_norm=True, name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                y = res_cls(ch, rk, tuple(rd), name=f"resblocks_{i * num_kernels + j}")(x)
                xs = y if xs is None else xs + y
            x = xs / num_kernels

        # final activation uses torch's default slope 0.01 (model_24k.py:284)
        x = jax.nn.leaky_relu(x, 0.01)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)
