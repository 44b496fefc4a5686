"""HiFi-GAN residual blocks (vqvae/modules/modules.py:240-379), NTC layout.

Weight norm from the torch reference is folded into plain kernels at
checkpoint-conversion time for serving; under the weight_norm_reparam()
training context the convs carry the reference's (g, v) parameterization
(modules.py:245-379 wraps every resblock conv).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax

from detail_tts_tpu.nn.common import Conv1d, get_padding, leaky_relu


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: Optional[jax.Array] = None) -> jax.Array:
        for j, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        weight_norm=True, name=f"convs1_{j}")(xt)
            xt = leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=1,
                        padding=get_padding(self.kernel_size, 1),
                        weight_norm=True, name=f"convs2_{j}")(xt)
            x = x + xt
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: Optional[jax.Array] = None) -> jax.Array:
        for j, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        weight_norm=True, name=f"convs_{j}")(xt)
            x = x + xt
        if x_mask is not None:
            x = x * x_mask
        return x
