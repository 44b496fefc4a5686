"""VITS relative-position transformer encoder (vqvae/modules/attentions.py), NTC.

``MultiHeadAttention`` implements the learned windowed relative key/value
embeddings (window=4, shared across heads) with the standard
relative->absolute skewing trick; softmax runs in fp32.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import (Conv1d, TorchLayerNorm,
                                      _mm_operand_dtype)


def _relative_to_absolute(x: jax.Array) -> jax.Array:
    """(B, H, L, 2L-1) -> (B, H, L, L) (attentions.py:274-289)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jax.Array) -> jax.Array:
    """(B, H, L, L) -> (B, H, L, 2L-1) (attentions.py:291-303)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _get_relative_embeddings(emb: jax.Array, length: int, window: int) -> jax.Array:
    """Slice/pad (1, 2w+1, d) table to (1, 2L-1, d) (attentions.py:259-272)."""
    pad_len = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad_len > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class RelPosMultiHeadAttention(nn.Module):
    """Self/cross attention with optional windowed relative embeddings."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = 4

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array,
                 attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """x, c: (B, T, C); attn_mask: (B, 1, T_t, T_s) with 1=keep."""
        b, t_t, _ = x.shape
        t_s = c.shape[1]
        h, k_ch = self.n_heads, self.channels // self.n_heads

        q = Conv1d(self.channels, 1, name="conv_q")(x)
        k = Conv1d(self.channels, 1, name="conv_k")(c)
        v = Conv1d(self.channels, 1, name="conv_v")(c)

        # (B, T, C) -> (B, H, T, k_ch)
        q = q.reshape(b, t_t, h, k_ch).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_s, h, k_ch).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_s, h, k_ch).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(k_ch)
        # attention bmms follow the matmul_dtype autocast (torch autocast
        # covers bmm/matmul); softmax and the skewing adds stay fp32
        mdt = _mm_operand_dtype(x.dtype)
        scores = jnp.einsum("bhtd,bhsd->bhts", (q * scale).astype(mdt),
                            k.astype(mdt),
                            preferred_element_type=jnp.float32)

        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            rel_stddev = k_ch ** -0.5
            emb_rel_k = self.param(
                "emb_rel_k", nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, k_ch))
            emb_rel_v = self.param(
                "emb_rel_v", nn.initializers.normal(rel_stddev),
                (1, 2 * self.window_size + 1, k_ch))
            key_rel = _get_relative_embeddings(emb_rel_k, t_t, self.window_size)
            rel_logits = jnp.einsum("bhld,mrd->bhlr", (q * scale).astype(mdt),
                                    key_rel.astype(mdt),
                                    preferred_element_type=jnp.float32)
            scores = scores + _relative_to_absolute(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        p = nn.Dropout(self.p_dropout, deterministic=deterministic)(p)

        out = jnp.einsum("bhts,bhsd->bhtd", p.astype(mdt), v.astype(mdt),
                         preferred_element_type=jnp.float32)
        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p)
            value_rel = _get_relative_embeddings(emb_rel_v, t_s, self.window_size)
            out = out + jnp.einsum("bhlr,mrd->bhld", rel_weights.astype(mdt),
                                   value_rel.astype(mdt),
                                   preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Conv1d(self.out_channels, 1, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward with same/causal padding (attentions.py:317-363)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    causal: bool = False

    def _pad(self, x: jax.Array) -> jax.Array:
        if self.kernel_size == 1:
            return x
        if self.causal:
            pads = (self.kernel_size - 1, 0)
        else:
            pads = ((self.kernel_size - 1) // 2, self.kernel_size // 2)
        return jnp.pad(x, ((0, 0), pads, (0, 0)))

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        y = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(self._pad(x * x_mask))
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
        y = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(self._pad(y * x_mask))
        return y * x_mask


class RelPosTransformerEncoder(nn.Module):
    """attentions.Encoder (attentions.py:73-107)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """x: (B, T, C); x_mask: (B, T, 1)."""
        m = x_mask[..., 0]  # (B, T)
        attn_mask = m[:, None, :, None] * m[:, None, None, :]  # (B, 1, T, T)
        x = x * x_mask
        for i in range(self.n_layers):
            y = RelPosMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=self.window_size,
                name=f"attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = TorchLayerNorm(name=f"norm1_{i}")(x + y)

            y = FFN(self.hidden_channels, self.filter_channels, self.kernel_size,
                    p_dropout=self.p_dropout, name=f"ffn_{i}")(
                        x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = TorchLayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask
