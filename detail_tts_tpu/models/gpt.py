"""GPT acoustic decoder (``UnifiedVoice``, gpt/model.py:265-545), TPU-native.

A from-scratch flax GPT-2 (pre-LN, gelu_new, learned per-modality positions,
null global positions — matching the reference's HF-GPT2-with-nulled-wpe,
gpt/model.py:218-238) with:

* a real KV cache + ``lax.while_loop`` AR decode (the shipped reference runs
  ``kv_cache=False`` -> O(T^2) prefix recompute per token,
  vqvae/model_24k.py:602);
* fully batched multi-utterance decoding with per-sequence stop masking;
* optional ``jax.checkpoint`` (remat) over blocks for training.

Sequence layout (training): [cond(1), text(T_text+2), mel(T_mel+2)];
dual heads (text CE x0.01, mel CE x1.0 applied by the caller).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.config import GPTConfig
from detail_tts_tpu.nn.common import Dense, Embed, sequence_mask
from detail_tts_tpu.nn.style_encoder import MelStyleEncoder
from detail_tts_tpu.ops.sampling import sample_token


def gelu_new(x: jax.Array) -> jax.Array:
    """HF 'gelu_new' tanh approximation (GPT-2's activation)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * jnp.power(x, 3.0))))


class KVCache(NamedTuple):
    """Per-layer KV cache: tuples of L arrays, each (B, max_len, H, ch).

    Tuples (not a stacked (L, ...) array): inside the decode while_loop a
    stacked cache would be sliced per layer and re-stacked every step —
    XLA copies the whole cache each iteration (~230 MB/step at serving
    shapes).  Per-layer carry arrays update in place via
    dynamic_update_slice aliasing.
    """

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    length: jax.Array  # scalar int32: number of valid positions


class GPT2Attention(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, cache_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
                 cache_len: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """x: (B, T, D).

        Without cache: full causal self-attention; returns (out, (k, v)).
        With cache_kv=(k_cache, v_cache) of shape (B, M, H, ch) and
        cache_len: appends x's keys at [cache_len, cache_len+T) and attends
        causally over the cache; returns (out, (new_k, new_v)).
        """
        b, t, _ = x.shape
        h, ch = self.heads, self.dim // self.heads
        qkv = Dense(3 * self.dim, kernel_init=nn.initializers.normal(0.02),
                    name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, ch)
        k = k.reshape(b, t, h, ch)
        v = v.reshape(b, t, h, ch)

        if cache_kv is None:
            kk, vv = k, v
            q_pos = jnp.arange(t)
            k_pos = jnp.arange(t)
        else:
            k_cache, v_cache = cache_kv
            kk = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, cache_len, 0, 0))
            vv = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, cache_len, 0, 0))
            q_pos = cache_len + jnp.arange(t)
            k_pos = jnp.arange(kk.shape[1])

        scale = 1.0 / jnp.sqrt(jnp.asarray(ch, jnp.float32))
        # NOTE: deliberately NOT casting the attention bmms to the autocast
        # dtype: at GPT's training shapes (T~314, 3.8k kernels/step) the
        # step is per-op-overhead-bound and XLA already runs these fp32
        # dots at bf16 MXU rate — explicit casts measured 0.274 s vs
        # 0.227 s device (traced A/B).  The diffusion AttentionBlock, with
        # 13x larger logits, DOES cast (nn/diff_blocks.py).
        logits = jnp.einsum("bthd,bshd->bhts", q, kk) * scale
        causal = k_pos[None, :] <= q_pos[:, None]  # (T, S)
        logits = jnp.where(causal[None, None], logits, -1e9)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        w = nn.Dropout(self.dropout, deterministic=deterministic)(w)
        out = jnp.einsum("bhts,bshd->bthd", w, vv).reshape(b, t, self.dim)
        out = Dense(self.dim, kernel_init=nn.initializers.normal(0.02), name="c_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out, (kk, vv)


class GPT2Block(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.1
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, cache_kv=None, cache_len=None, deterministic=True):
        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_1")(x)
        a, new_kv = GPT2Attention(self.dim, self.heads, self.dropout, name="attn")(
            y, cache_kv=cache_kv, cache_len=cache_len, deterministic=deterministic)
        x = x + a
        y = nn.LayerNorm(epsilon=self.ln_eps, name="ln_2")(x)
        m = Dense(4 * self.dim, kernel_init=nn.initializers.normal(0.02), name="c_fc")(y)
        m = gelu_new(m)
        m = Dense(self.dim, kernel_init=nn.initializers.normal(0.02), name="c_proj")(m)
        m = nn.Dropout(self.dropout, deterministic=deterministic)(m)
        return x + m, new_kv


class GPT2Stack(nn.Module):
    """GPT-2 trunk over pre-computed input embeddings (wte/wpe are external)."""

    layers: int
    dim: int
    heads: int
    dropout: float = 0.1
    ln_eps: float = 1e-5
    remat: bool = False

    @nn.compact
    def __call__(self, emb, *, cache: Optional[KVCache] = None, deterministic=True):
        x = nn.Dropout(self.dropout, deterministic=deterministic)(emb)
        new_k, new_v = [], []
        block_cls = GPT2Block
        if self.remat and cache is None:
            # static_argnums counts `self` as 0: (x, cache_kv, cache_len,
            # deterministic) -> deterministic is 4.
            block_cls = nn.remat(GPT2Block, static_argnums=(4,),
                                 prevent_cse=False)
        for i in range(self.layers):
            ck = None if cache is None else (cache.k[i], cache.v[i])
            cl = None if cache is None else cache.length
            x, kv = block_cls(self.dim, self.heads, self.dropout, self.ln_eps,
                              name=f"h_{i}")(x, ck, cl, deterministic)
            new_k.append(kv[0])
            new_v.append(kv[1])
        x = nn.LayerNorm(epsilon=self.ln_eps, name="ln_f")(x)
        if cache is None:
            return x, None
        new_cache = KVCache(tuple(new_k), tuple(new_v),
                            cache.length + emb.shape[1])
        return x, new_cache


class UnifiedVoice(nn.Module):
    cfg: GPTConfig
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.conditioning_encoder = MelStyleEncoder(
            n_mel_channels=c.spec_channels, style_vector_dim=c.model_dim,
            style_hidden=c.model_dim // 2, name="conditioning_encoder")
        # types=1 in the reference -> text vocab = number_text_tokens + 1
        self.text_embedding = Embed(c.number_text_tokens + 1, c.model_dim,
                                    name="text_embedding")
        self.mel_embedding = Embed(c.number_mel_codes, c.model_dim,
                                   name="mel_embedding")
        # LearnedPositionEmbeddings (gpt/model.py:203-215); table sizes match
        # build_hf_gpt_transformer(max_mel+2+max_cond, max_text+2).
        self.mel_pos_embedding = Embed(
            c.max_mel_tokens + 2 + c.max_conditioning_inputs, c.model_dim,
            name="mel_pos_embedding")
        self.text_pos_embedding = Embed(c.max_text_tokens + 2, c.model_dim,
                                        name="text_pos_embedding")
        self.gpt = GPT2Stack(c.layers, c.model_dim, c.heads, c.dropout,
                             c.layer_norm_eps, remat=self.remat, name="gpt")
        self.final_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_norm")
        self.text_head = Dense(c.number_text_tokens + 1, name="text_head")
        self.mel_head = Dense(c.number_mel_codes, name="mel_head")

    # ------------------------------------------------------------------ util

    def _condition(self, cond_mel: jax.Array, cond_lengths: jax.Array,
                   deterministic: bool = True) -> jax.Array:
        mask = sequence_mask(cond_lengths, cond_mel.shape[1])
        return self.conditioning_encoder(cond_mel, mask, deterministic=deterministic)

    def set_mel_padding(self, mel_codes: jax.Array, wav_lengths: jax.Array) -> jax.Array:
        """Replace padding with stop tokens (gpt/model.py:377-390)."""
        mel_lengths = wav_lengths // self.cfg.mel_length_compression
        pos = jnp.arange(mel_codes.shape[1])
        keep = pos[None, :] < (mel_lengths[:, None] + 1)
        return jnp.where(keep, mel_codes, self.cfg.stop_mel_token)

    @staticmethod
    def _build_aligned(x: jax.Array, start: int, stop: int):
        inp = jnp.pad(x, ((0, 0), (1, 0)), constant_values=start)
        tar = jnp.pad(x, ((0, 0), (0, 1)), constant_values=stop)
        return inp, tar

    def _text_inputs(self, text: jax.Array):
        c = self.cfg
        padded = jnp.pad(text, ((0, 0), (0, 1)), constant_values=c.stop_text_token)
        inp, tar = self._build_aligned(padded, c.start_text_token, c.stop_text_token)
        emb = self.text_embedding(inp) + self.text_pos_embedding(
            jnp.arange(inp.shape[1]))
        return inp, tar, emb

    # -------------------------------------------------------------- training

    def __call__(self, cond_mel, cond_lengths, text, text_lengths, mel_codes,
                 wav_lengths, return_latent: bool = False,
                 deterministic: bool = True):
        """Training forward (gpt/model.py:429-491); text_first semantics.

        cond_mel: (B, T_cond, n_spec); text: (B, T_text) int; mel_codes:
        (B, T_code) int; wav_lengths: (B,).
        Returns (loss_text, loss_mel, mel_logits) or latents (B, T_code, D).
        """
        c = self.cfg
        cond = self._condition(cond_mel, cond_lengths, deterministic)[:, None, :]

        mel_codes = self.set_mel_padding(mel_codes, wav_lengths)
        mel_padded = jnp.pad(mel_codes, ((0, 0), (0, 1)),
                             constant_values=c.stop_mel_token)
        mel_inp, mel_tar = self._build_aligned(mel_padded, c.start_mel_token,
                                               c.stop_mel_token)
        _, text_tar, text_emb = self._text_inputs(text)
        mel_emb = self.mel_embedding(mel_inp) + self.mel_pos_embedding(
            jnp.arange(mel_inp.shape[1]))

        emb = jnp.concatenate([cond, text_emb, mel_emb], axis=1)
        hidden, _ = self.gpt(emb, deterministic=deterministic)
        # first position is tied to the conditioning input (gpt/model.py:402)
        enc = self.final_norm(hidden[:, 1:])

        n_text = text_emb.shape[1]
        text_latents = enc[:, :n_text]
        mel_latents = enc[:, -mel_emb.shape[1]:]
        if return_latent:
            return mel_latents[:, :-2]

        text_logits = self.text_head(text_latents)
        mel_logits = self.mel_head(mel_latents)

        loss_text = _mean_ce(text_logits, text_tar)
        loss_mel = _mean_ce(mel_logits, mel_tar)
        return loss_text, loss_mel, mel_logits

    # -------------------------------------------------------------- inference

    def prefill_embeddings(self, cond_mel, cond_lengths, text):
        """[cond, text_emb, start_mel_emb] prefix (gpt/model.py:514-530)."""
        c = self.cfg
        cond = self._condition(cond_mel, cond_lengths)[:, None, :]
        _, _, text_emb = self._text_inputs(text)
        start = jnp.full((text.shape[0], 1), c.start_mel_token, jnp.int32)
        start_emb = self.mel_embedding(start) + self.mel_pos_embedding(
            jnp.arange(1))
        return jnp.concatenate([cond, text_emb, start_emb], axis=1)

    def decode_prefill(self, emb, cache: KVCache):
        """Run the prefix through the trunk, filling the cache.

        Returns (mel logits at the last position (B, V), cache).
        """
        hidden, cache = self.gpt(emb, cache=cache)
        logits = self.mel_head(self.final_norm(hidden[:, -1]))
        return logits, cache

    def decode_step(self, token: jax.Array, position: jax.Array, cache: KVCache):
        """One cached AR step: token (B,), mel position index (B,)."""
        emb = self.mel_embedding(token[:, None]) + self.mel_pos_embedding(
            position[:, None])
        hidden, cache = self.gpt(emb, cache=cache)
        logits = self.mel_head(self.final_norm(hidden[:, -1]))
        return logits, cache

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
        c = self.cfg
        shape = (batch, max_len, c.heads, c.model_dim // c.heads)
        return KVCache(tuple(jnp.zeros(shape, dtype) for _ in range(c.layers)),
                       tuple(jnp.zeros(shape, dtype) for _ in range(c.layers)),
                       jnp.asarray(0, jnp.int32))


def _mean_ce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Unmasked mean cross-entropy (reference uses plain F.cross_entropy —
    padding regions are stop-token supervised by construction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


# ---------------------------------------------------------------------------
# Batched sampling loop (replaces HF generate; vqvae/model_24k.py:782-792)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.8
    top_p: float = 0.8
    repetition_penalty: float = 2.0
    max_generate_length: int = 600
    # entropy-typical filtering, off by default (reference typical_sampling)
    typical_mass: float = 1.0
    # Benchmark mode: ignore stop tokens and always decode max_generate_length
    # steps (fixed work per call, for throughput measurement).
    force_full_length: bool = False


def generate_speech_tokens(model: UnifiedVoice, params, rng, cond_mel,
                           cond_lengths, text,
                           sampling: SamplingConfig = SamplingConfig(),
                           cache_dtype=jnp.bfloat16):
    """Tortoise-style AR decode with KV cache.

    Returns (codes (B, max_len) int32 padded with stop tokens, lengths (B,)).
    ``lengths`` counts generated tokens *including* the stop token when one
    was produced, matching the reference slice ``codes[:, :-1]`` semantics.
    """
    c = model.cfg
    b = text.shape[0]
    prefill = model.apply(params, cond_mel, cond_lengths, text,
                          method=UnifiedVoice.prefill_embeddings)
    prefix_len = prefill.shape[1]
    max_len = prefix_len + sampling.max_generate_length

    cache = model.apply(params, b, max_len, cache_dtype,
                        method=UnifiedVoice.init_cache)
    logits, cache = model.apply(params, prefill, cache,
                                method=UnifiedVoice.decode_prefill)

    # Repetition penalty covers the fake prefix: filler id 1 + start token.
    seen0 = jnp.zeros((b, c.number_mel_codes), bool)
    seen0 = seen0.at[:, 1].set(True).at[:, c.start_mel_token].set(True)

    codes0 = jnp.full((b, sampling.max_generate_length), c.stop_mel_token,
                      jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    lengths0 = jnp.zeros((b,), jnp.int32)

    def cond_fn(state):
        step, _, _, _, finished, _, _, _ = state
        return jnp.logical_and(step < sampling.max_generate_length,
                               ~jnp.all(finished))

    def body_fn(state):
        step, rng, logits, cache, finished, seen, codes, lengths = state
        rng, key = jax.random.split(rng)
        tok = sample_token(key, logits, seen_mask=seen,
                           temperature=sampling.temperature,
                           top_p=sampling.top_p,
                           repetition_penalty=sampling.repetition_penalty,
                           typical_mass=sampling.typical_mass)
        tok = jnp.where(finished, c.stop_mel_token, tok)
        codes = jax.lax.dynamic_update_slice(codes, tok[:, None], (0, step))
        seen = seen.at[jnp.arange(b), tok].set(True)
        if sampling.force_full_length:
            now_finished = finished
        else:
            now_finished = finished | (tok == c.stop_mel_token)
        lengths = jnp.where(finished, lengths, lengths + 1)
        # mel positions: start token at 0, generated token i at i+1
        logits, cache = model.apply(params, tok, jnp.full((b,), step + 1),
                                    cache, method=UnifiedVoice.decode_step)
        return (step + 1, rng, logits, cache, now_finished, seen, codes, lengths)

    state = (jnp.asarray(0), rng, logits, cache, finished0, seen0, codes0, lengths0)
    state = jax.lax.while_loop(cond_fn, body_fn, state)
    _, _, _, _, _, _, codes, lengths = state
    return codes, lengths
