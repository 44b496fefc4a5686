"""MelStyleEncoder: global style vector from a mel (modules.py:642-720), NTC.

spectral MLP (Mish) -> 2x Conv1dGLU -> MHA (temperature sqrt(d_model), a
reference quirk kept for parity) -> linear -> masked temporal average pool.
Returns a (B, out_dim) vector.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import (Conv1d, Dense, _mm_operand_dtype,
                                      mish)


class Conv1dGLU(nn.Module):
    """Conv + GLU with residual (modules.py:505-523)."""

    channels: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        residual = x
        h = Conv1d(2 * self.channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2, name="conv")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return residual + h


class StyleSelfAttention(nn.Module):
    """modules.MultiHeadAttention (modules.py:562-616): post-residual MHA.

    Softmax temperature is sqrt(d_model) — not sqrt(d_k) — matching the
    reference's ScaledDotProductAttention construction (modules.py:576-578).
    """

    hidden_dim: int
    n_head: int
    dropout: float

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        b, t, _ = x.shape
        d_k = self.hidden_dim // self.n_head
        residual = x
        q = Dense(self.n_head * d_k, name="w_qs")(x).reshape(b, t, self.n_head, d_k)
        k = Dense(self.n_head * d_k, name="w_ks")(x).reshape(b, t, self.n_head, d_k)
        v = Dense(self.n_head * d_k, name="w_vs")(x).reshape(b, t, self.n_head, d_k)
        # attention bmms follow the matmul_dtype autocast; softmax fp32
        mdt = _mm_operand_dtype(x.dtype)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(mdt), k.astype(mdt),
                            preferred_element_type=jnp.float32
                            ) / math.sqrt(self.hidden_dim)
        if mask is not None:  # mask: (B, T) with 1=valid
            bad = (mask[:, None, None, :] == 0)
            scores = jnp.where(bad, -jnp.inf, scores)
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        p = nn.Dropout(self.dropout, deterministic=deterministic)(p)
        out = jnp.einsum("bhts,bshd->bthd", p.astype(mdt), v.astype(mdt),
                         preferred_element_type=jnp.float32
                         ).astype(x.dtype).reshape(b, t, self.n_head * d_k)
        out = Dense(self.hidden_dim, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out + residual


class MelStyleEncoder(nn.Module):
    n_mel_channels: int = 80
    style_hidden: int = 128
    style_vector_dim: int = 256
    style_kernel_size: int = 5
    style_head: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, mel: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """mel: (B, T, n_mels); mask: (B, T) 1=valid.  Returns (B, out_dim)."""
        x = Dense(self.style_hidden, name="spectral_0")(mel)
        x = mish(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = Dense(self.style_hidden, name="spectral_1")(x)
        x = mish(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.dropout,
                      name="temporal_0")(x, deterministic=deterministic)
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.dropout,
                      name="temporal_1")(x, deterministic=deterministic)

        if mask is not None:
            x = x * mask[..., None]
        x = StyleSelfAttention(self.style_hidden, self.style_head, self.dropout,
                               name="slf_attn")(x, mask, deterministic=deterministic)
        x = Dense(self.style_vector_dim, name="fc")(x)

        if mask is None:
            return jnp.mean(x, axis=1)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        return jnp.sum(x * mask[..., None], axis=1) / denom.astype(x.dtype)
