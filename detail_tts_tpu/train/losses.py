"""GAN / VAE training losses (reference: vqvae/modules/losses.py:4-58).

All losses compute in fp32 regardless of input dtype (the reference calls
``.float()`` on every operand).  Feature maps and logits arrive as lists of
per-discriminator outputs, matching ``MultiPeriodDiscriminator``'s return
structure.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def feature_loss(fmap_r: Sequence[Sequence[jax.Array]],
                 fmap_g: Sequence[Sequence[jax.Array]]) -> jax.Array:
    """Feature-matching L1, summed over all layers, x2 (losses.py:4-13)."""
    loss = jnp.asarray(0.0, jnp.float32)
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss = loss + jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(disc_real: Sequence[jax.Array],
                       disc_fake: Sequence[jax.Array]
                       ) -> Tuple[jax.Array, List[jax.Array], List[jax.Array]]:
    """Least-squares GAN D loss (losses.py:16-29)."""
    loss = jnp.asarray(0.0, jnp.float32)
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_fake):
        r = jnp.mean((1.0 - dr.astype(jnp.float32)) ** 2)
        g = jnp.mean(dg.astype(jnp.float32) ** 2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_fake: Sequence[jax.Array]
                   ) -> Tuple[jax.Array, List[jax.Array]]:
    """Least-squares GAN G loss (losses.py:32-41)."""
    loss = jnp.asarray(0.0, jnp.float32)
    per = []
    for dg in disc_fake:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        per.append(l)
        loss = loss + l
    return loss, per


def kl_loss(z_p: jax.Array, logs_q: jax.Array, m_p: jax.Array,
            logs_p: jax.Array, z_mask: jax.Array) -> jax.Array:
    """Masked KL between flowed posterior and prior (losses.py:44-58).

    All tensors NTC: (B, T, C); z_mask (B, T, 1).
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)

    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
