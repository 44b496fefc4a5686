"""Gated WaveNet stack (VITS ``WN``, vqvae/modules/modules.py:152-229), NTC."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import Conv1d, fused_gate


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 g: Optional[jax.Array] = None, deterministic: bool = True) -> jax.Array:
        """x: (B, T, H); x_mask: (B, T, 1); g: (B, gin) global conditioning."""
        output = jnp.zeros_like(x)

        g_all = None
        if g is not None and self.gin_channels > 0:
            # cond_layer: 1x1 conv over the (length-1) global vector.
            g_all = Conv1d(2 * self.hidden_channels * self.n_layers, 1,
                           weight_norm=True, name="cond_layer")(
                g[:, None, :]
            )  # (B, 1, 2H*n_layers)

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                2 * self.hidden_channels, self.kernel_size,
                dilation=dilation, padding=padding, weight_norm=True,
                name=f"in_{i}",
            )(x)
            if g_all is not None:
                off = i * 2 * self.hidden_channels
                x_in = x_in + g_all[:, :, off : off + 2 * self.hidden_channels]
            acts = fused_gate(x_in)
            if self.p_dropout > 0:
                acts = nn.Dropout(self.p_dropout, deterministic=deterministic)(acts)

            last = i == self.n_layers - 1
            res_skip_ch = self.hidden_channels if last else 2 * self.hidden_channels
            res_skip = Conv1d(res_skip_ch, 1, weight_norm=True,
                              name=f"res_skip_{i}")(acts)
            if not last:
                x = (x + res_skip[..., : self.hidden_channels]) * x_mask
                output = output + res_skip[..., self.hidden_channels :]
            else:
                output = output + res_skip
        return output * x_mask
