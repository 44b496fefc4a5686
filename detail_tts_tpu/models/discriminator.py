"""Multi-period + scale discriminators (vqvae/model_24k.py:298-431).

Waveforms are (B, T, 1) NTC.  DiscriminatorP reshapes time into
(time//period, period) and runs 2-D convs; DiscriminatorS runs grouped 1-D
convs.  The reference weight-norms every conv (model_24k.py:303-353,
381-392); under the weight_norm_reparam() training context these carry the
same (g, v) parameterization, folded kernels otherwise.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import (Conv1d, Conv2d, get_padding,
                                       leaky_relu)


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        """x: (B, T, 1) -> (flat logits, feature maps)."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        # (B, T, C) -> (B, T//p, p, C): height=frames, width=period
        x = x.reshape(b, t // self.period, self.period, c)

        fmap = []
        pad = get_padding(self.kernel_size, 1)
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = Conv2d(ch, kernel_size=(self.kernel_size, 1),
                       strides=(self.stride, 1),
                       padding=((pad, pad), (0, 0)), weight_norm=True,
                       name=f"conv_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv2d(1024, kernel_size=(self.kernel_size, 1), strides=(1, 1),
                   padding=((pad, pad), (0, 0)), weight_norm=True,
                   name="conv_4")(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = Conv2d(1, kernel_size=(3, 1), padding=((1, 1), (0, 0)),
                   weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        """x: (B, T, 1)."""
        b = x.shape[0]
        fmap = []
        specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, p) in enumerate(specs):
            x = Conv1d(ch, k, stride=s, groups=g, padding=p,
                       weight_norm=True, name=f"conv_{i}")(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = Conv1d(1, 3, padding=1, weight_norm=True, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        """Returns (real_logits, fake_logits, real_fmaps, fake_fmaps)."""
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            r_logit, r_fmap = d(y)
            g_logit, g_fmap = d(y_hat)
            y_d_rs.append(r_logit)
            y_d_gs.append(g_logit)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
