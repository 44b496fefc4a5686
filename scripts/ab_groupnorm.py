"""A/B GroupNorm32 stats strategies at the diffusion serving shape.

(16, 1600, 768) bf16, 32 groups.  N=40 back-to-back norms under one jit
(mirrors ~40 norms per diffusion step).  Run on the TPU.

CAVEAT (measured 2026-08): all variants tie at ~0.8-0.95 ms/norm, and a
bare x*1.0001 pass costs the same — the harness's scalar carry
(y[0,0,0] -> acc) serializes iterations on a ~0.7-1.4 ms loop-turnaround
latency, so these numbers measure the dependency chain, not the norm.
In-program trace numbers (parse_trace.py --raw): ~0.45 ms per stats
fusion.  Kept for the record; a better harness needs an array-valued
carry with no scalar extraction.
"""
import sys
import time

import jax
import jax.numpy as jnp

B, T, C, G = 16, 1600, 768, 32
N = 40


def gn_reduce(x, scale, bias, eps=1e-5):
    """Current: one-pass fused reductions over (T, C/G)."""
    xg = x.reshape(B, T, G, C // G)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mul = jnp.repeat(inv, C // G, axis=-1) * scale[None]
    add = bias[None] - jnp.repeat(mean * inv, C // G, axis=-1) * scale[None]
    return x * mul.astype(x.dtype)[:, None, :] + add.astype(x.dtype)[:, None, :]


def gn_matmul(x, scale, bias, eps=1e-5):
    """Stats via MXU: contract T with a ones vector; x^2 fuses into the dot."""
    ones = jnp.ones((T,), jnp.bfloat16)
    s1 = jax.lax.dot_general(ones, x, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (B, C)
    s2 = jax.lax.dot_general(ones, x * x, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    cm = s1.reshape(B, G, C // G)
    cs = s2.reshape(B, G, C // G)
    n = T * (C // G)
    mean = jnp.sum(cm, axis=-1) / n
    mean_sq = jnp.sum(cs, axis=-1) / n
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mul = jnp.repeat(inv, C // G, axis=-1) * scale[None]
    add = bias[None] - jnp.repeat(mean * inv, C // G, axis=-1) * scale[None]
    return x * mul.astype(x.dtype)[:, None, :] + add.astype(x.dtype)[:, None, :]


def gn_flax(x, scale, bias, eps=1e-5):
    import flax.linen as nn

    return nn.GroupNorm(num_groups=G, epsilon=eps).apply(
        {"params": {"scale": scale, "bias": bias}}, x)


def build(fn):
    @jax.jit
    def run(x, scale, bias):
        def body(i, acc):
            y = fn(x + acc.astype(x.dtype), scale, bias)
            return acc + y[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))
    return run


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, C), jnp.bfloat16) * 3
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    print(f"platform={jax.devices()[0].platform} shape=({B},{T},{C}) G={G} N={N}")
    for name, fn in (("reduce", gn_reduce), ("matmul", gn_matmul),
                     ("flax", gn_flax), ("reduce2", gn_reduce)):
        run = build(fn)
        r = run(x, scale, bias); jax.device_get(r)
        t0 = time.perf_counter()
        r = run(x, scale, bias); jax.device_get(r)
        dt = time.perf_counter() - t0
        gbps = N * (B * T * C * 2 * 2) / dt / 1e9
        print(f"{name:8s}: {dt / N * 1000:6.3f} ms/norm  ({gbps:5.0f} GB/s eff)")


if __name__ == "__main__":
    main()
