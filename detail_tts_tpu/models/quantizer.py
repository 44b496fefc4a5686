"""Residual vector quantizer with EMA codebook, functional state, SPMD-safe.

Re-implements the reference RVQ (vqvae/modules/quantize.py +
vqvae/modules/core_vq.py): k-means init on the first training batch
(500-sample cap), EMA codebook update (decay 0.99, laplace smoothing 1e-5),
dead-code expiry below cluster-size 2, straight-through estimator, commit
MSE, and a project_in/project_out bottleneck (dim -> codebook_dim=8 -> dim).

TPU-native differences:
* Codebook state lives in an explicit flax variable collection
  (``vq_state``) threaded through the train step — no in-place buffer
  mutation under autodiff.
* Under a device mesh, cluster statistics are ``psum``-reduced over the data
  axis before the EMA update, and the k-means init runs on an all-gathered
  sample set, so every replica holds an identical codebook (the reference
  left its cross-worker ``broadcast_tensors`` commented out,
  core_vq.py:150-151,169).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.nn.common import Dense


def _sample_vectors(rng: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """Sample ``num`` rows with replacement (core_vq.py:60-68; the reference
    uses randperm when enough samples exist — with bins >> samples the
    replacement path is the live one)."""
    n = samples.shape[0]
    idx = jax.random.randint(rng, (num,), 0, n)
    return samples[idx]


def _kmeans(rng: jax.Array, samples: jax.Array, num_clusters: int,
            num_iters: int) -> Tuple[jax.Array, jax.Array]:
    """(N, D) -> (means (C, D), bins (C,)) (core_vq.py:71-93)."""
    dim = samples.shape[-1]
    means = _sample_vectors(rng, samples, num_clusters)

    def body(_, means):
        # squared L2 distances, (N, C)
        d = (
            jnp.sum(samples ** 2, -1, keepdims=True)
            - 2.0 * samples @ means.T
            + jnp.sum(means ** 2, -1)[None, :]
        )
        buckets = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)
        new_means = onehot.T @ samples / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    # final assignment counts
    d = (
        jnp.sum(samples ** 2, -1, keepdims=True)
        - 2.0 * samples @ means.T
        + jnp.sum(means ** 2, -1)[None, :]
    )
    bins = jnp.sum(jax.nn.one_hot(jnp.argmin(d, -1), num_clusters,
                                  dtype=samples.dtype), axis=0)
    return means, bins


class EuclideanCodebook(nn.Module):
    """EMA codebook over (N, D) fp32 vectors (core_vq.py:96-231)."""

    codebook_size: int
    dim: int
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_ema_dead_code: float = 2.0
    kmeans_iters: int = 50
    kmeans_sample_cap: int = 500

    def setup(self):
        self.inited = self.variable(
            "vq_state", "inited", lambda: jnp.zeros((), bool))
        self.cluster_size = self.variable(
            "vq_state", "cluster_size",
            lambda: jnp.zeros((self.codebook_size,), jnp.float32))
        self.embed = self.variable(
            "vq_state", "embed",
            lambda: jnp.zeros((self.codebook_size, self.dim), jnp.float32))
        self.embed_avg = self.variable(
            "vq_state", "embed_avg",
            lambda: jnp.zeros((self.codebook_size, self.dim), jnp.float32))

    def quantize_ids(self, x: jax.Array) -> jax.Array:
        """(..., D) -> (...,) nearest-codebook indices."""
        flat = x.reshape(-1, self.dim).astype(jnp.float32)
        embed = self.embed.value
        dist = (
            jnp.sum(flat ** 2, -1, keepdims=True)
            - 2.0 * flat @ embed.T
            + jnp.sum(embed ** 2, -1)[None, :]
        )
        return jnp.argmin(dist, axis=-1).reshape(x.shape[:-1])

    def lookup(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.embed.value, ids, axis=0)

    def __call__(self, x: jax.Array, *, train: bool = False,
                 axis_name: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
        """x: (..., D).  Returns (quantized, ids); updates state if train."""
        flat = x.reshape(-1, self.dim).astype(jnp.float32)

        if train:
            rng = self.make_rng("vq")

            def do_init(_):
                samples = flat[: self.kmeans_sample_cap]
                if axis_name is not None:
                    samples = jax.lax.all_gather(samples, axis_name)
                    samples = samples.reshape(-1, self.dim)[: self.kmeans_sample_cap]
                embed, bins = _kmeans(rng, samples, self.codebook_size,
                                      self.kmeans_iters)
                if axis_name is not None:
                    # identical inputs+rng on every shard -> pmean is an
                    # exact no-op that (a) enforces the cross-replica sync
                    # and (b) makes the value axis-invariant for lax.cond
                    embed = jax.lax.pmean(embed, axis_name)
                    bins = jax.lax.pmean(bins, axis_name)
                return embed, embed, bins

            def no_init(_):
                return (self.embed.value, self.embed_avg.value,
                        self.cluster_size.value)

            embed, embed_avg, cluster_size = jax.lax.cond(
                self.inited.value, no_init, do_init, None)
            self.embed.value = embed
            self.embed_avg.value = embed_avg
            self.cluster_size.value = cluster_size
            self.inited.value = jnp.ones((), bool)

        ids = self.quantize_ids(x)
        quantized = self.lookup(ids)

        if train:
            # --- dead-code expiry (core_vq.py:217-229; note the reference's
            # subsequent EMA write overwrites the replaced rows, a behaviour
            # kept for parity — only embed_avg-driven state persists)
            expired = self.cluster_size.value < self.threshold_ema_dead_code
            replacement = _sample_vectors(self.make_rng("vq"), flat,
                                          self.codebook_size)
            if axis_name is not None:
                # identical replacements on all replicas: take replica 0's
                # (masked psum keeps the value axis-invariant)
                is0 = jax.lax.axis_index(axis_name) == 0
                replacement = jax.lax.psum(
                    jnp.where(is0, replacement, jnp.zeros_like(replacement)),
                    axis_name)
            self.embed.value = jnp.where(expired[:, None], replacement,
                                         self.embed.value)

            # --- EMA stats, psum-reduced across data replicas
            onehot = jax.nn.one_hot(ids.reshape(-1), self.codebook_size,
                                    dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)
            embed_sum = onehot.T @ flat
            if axis_name is not None:
                counts = jax.lax.psum(counts, axis_name)
                embed_sum = jax.lax.psum(embed_sum, axis_name)

            d = self.decay
            self.cluster_size.value = self.cluster_size.value * d + counts * (1 - d)
            self.embed_avg.value = self.embed_avg.value * d + embed_sum * (1 - d)
            n = jnp.sum(self.cluster_size.value)
            smoothed = ((self.cluster_size.value + self.epsilon)
                        / (n + self.codebook_size * self.epsilon) * n)
            self.embed.value = self.embed_avg.value / smoothed[:, None]

        # the returned vectors use the pre-update codebook (reference order)
        return quantized.astype(x.dtype), ids


class VectorQuantization(nn.Module):
    """Single VQ layer with projection bottleneck (core_vq.py:234-323)."""

    dim: int
    codebook_size: int
    codebook_dim: int = 8
    decay: float = 0.99
    commitment_weight: float = 1.0
    threshold_ema_dead_code: float = 2.0
    kmeans_iters: int = 50

    def setup(self):
        needs_proj = self.codebook_dim != self.dim
        self.project_in = Dense(self.codebook_dim, name="project_in") if needs_proj else None
        self.project_out = Dense(self.dim, name="project_out") if needs_proj else None
        self.codebook = EuclideanCodebook(
            self.codebook_size, self.codebook_dim, decay=self.decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
            kmeans_iters=self.kmeans_iters, name="codebook")

    def __call__(self, x: jax.Array, *, train: bool = False,
                 axis_name: Optional[str] = None):
        """x: (B, T, dim) -> (quantized (B, T, dim), ids (B, T), commit_loss)."""
        z = self.project_in(x) if self.project_in is not None else x
        q, ids = self.codebook(z, train=train, axis_name=axis_name)
        commit = jnp.asarray(0.0, jnp.float32)
        if train:
            q_st = z + jax.lax.stop_gradient(q - z)  # straight-through
            commit = jnp.mean(
                (jax.lax.stop_gradient(q) - z.astype(jnp.float32)) ** 2)
            q = q_st
        out = self.project_out(q) if self.project_out is not None else q
        return out, ids, commit

    def encode(self, x: jax.Array) -> jax.Array:
        z = self.project_in(x) if self.project_in is not None else x
        return self.codebook.quantize_ids(z)

    def decode(self, ids: jax.Array) -> jax.Array:
        q = self.codebook.lookup(ids)
        return self.project_out(q) if self.project_out is not None else q


class ResidualVectorQuantizer(nn.Module):
    """RVQ over n_q layers (n_q=1 in the live config) (quantize.py:28-120)."""

    dimension: int
    n_q: int = 1
    bins: int = 8192
    codebook_dim: int = 8
    decay: float = 0.99
    threshold_ema_dead_code: float = 2.0
    kmeans_iters: int = 50

    def setup(self):
        self.layers = [
            VectorQuantization(
                self.dimension, self.bins, codebook_dim=self.codebook_dim,
                decay=self.decay,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
                kmeans_iters=self.kmeans_iters, name=f"layer_{i}")
            for i in range(self.n_q)
        ]

    def __call__(self, x: jax.Array, *, train: bool = False,
                 axis_name: Optional[str] = None):
        """x: (B, T, dim).  Returns (quantized_out, ids (n_q, B, T), commit)."""
        residual = x
        quantized_out = jnp.zeros_like(x)
        all_ids: List[jax.Array] = []
        losses = []
        for layer in self.layers:
            q, ids, commit = layer(residual, train=train, axis_name=axis_name)
            residual = residual - q
            quantized_out = quantized_out + q
            all_ids.append(ids)
            losses.append(commit)
        commit_loss = jnp.mean(jnp.stack(losses))
        return quantized_out, jnp.stack(all_ids), commit_loss

    def encode(self, x: jax.Array) -> jax.Array:
        residual = x
        all_ids = []
        for layer in self.layers:
            ids = layer.encode(residual)
            residual = residual - layer.decode(ids)
            all_ids.append(ids)
        return jnp.stack(all_ids)

    def decode(self, ids: jax.Array) -> jax.Array:
        """ids: (n_q, B, T) -> (B, T, dim)."""
        out = None
        for i, layer in enumerate(self.layers):
            q = layer.decode(ids[i])
            out = q if out is None else out + q
        return out
