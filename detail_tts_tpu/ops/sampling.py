"""Token-sampling ops reproducing HF ``generate`` semantics in jittable JAX.

The reference samples with RepetitionPenaltyLogitsProcessor(2.0) ->
temperature(0.8) -> top_p(0.8) -> multinomial (vqvae/model_24k.py:782-792 via
HF generate).  The repetition penalty covers *every* token id present in the
running sequence — including the constant filler id 1 and the start token of
the fake prefix — so we carry an explicit seen-token mask.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_repetition_penalty(logits: jax.Array, seen_mask: jax.Array,
                             penalty: float) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor: score>0 -> /p else *p.

    logits: (B, V); seen_mask: (B, V) bool.
    """
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def apply_temperature(logits: jax.Array, temperature: float) -> jax.Array:
    if temperature == 1.0:
        return logits
    return logits / temperature


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """HF TopPLogitsWarper (min_tokens_to_keep=1), exact scatter semantics.

    Matches transformers' warper element-wise, including tied logits: the
    removal flag is computed per *sorted position* and scattered back through
    the (stable) sort permutation, so among equal logits at the nucleus
    boundary only the sort-order-earlier copies are removed — not the whole
    tie group.  fp32 softmax.
    """
    if top_p >= 1.0:
        return logits
    order = jnp.argsort(logits, axis=-1)  # ascending, stable
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    # never remove the final (highest-prob) token
    remove_sorted = remove_sorted.at[..., -1].set(False)
    # scatter back: remove[..., order[..., k]] = remove_sorted[..., k]
    remove = jnp.zeros(logits.shape, dtype=bool)
    remove = jnp.put_along_axis(remove, order, remove_sorted, axis=-1,
                                inplace=False)
    return jnp.where(remove, -jnp.inf, logits)


def apply_typical(logits: jax.Array, mass: float = 0.9) -> jax.Array:
    """Entropy-typical filtering (gpt/modules/typical_sampling.py:1-33,
    opt-in in the reference via ``typical_sampling=True``)."""
    if mass >= 1.0:
        return logits
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    entropy = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - entropy)
    order = jnp.argsort(shifted, axis=-1)  # ascending: most typical first
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    last_ind = jnp.sum((cum < mass).astype(jnp.int32), axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(jnp.sort(shifted, axis=-1), last_ind, axis=-1)
    remove = shifted > thresh
    return jnp.where(remove, -jnp.inf, logits)


def sample_token(rng: jax.Array, logits: jax.Array, *, seen_mask: jax.Array,
                 temperature: float = 0.8, top_p: float = 0.8,
                 repetition_penalty: float = 2.0,
                 typical_mass: float = 1.0) -> jax.Array:
    """One decode-step sample, (B, V) -> (B,) int32."""
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, seen_mask, repetition_penalty)
    logits = apply_temperature(logits, temperature)
    logits = apply_typical(logits, typical_mass)
    logits = apply_top_p(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
