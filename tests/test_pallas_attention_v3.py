"""Packed lane-padded attention kernel parity (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.ops.pallas.attention import attention_packed


def test_packed_kernel_matches_xla():
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 200, 4, 48
    qkv = jnp.asarray(rng.normal(size=(b, t, h, 3, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, t, t)), jnp.float32)
    sm = 1.0 / np.sqrt(d)

    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    logits = jnp.einsum("bthd,bshd->bhts", q, k) * sm + bias[None]
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhts,bshd->bthd", w, v)

    packed = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 128 - d)))
    out = attention_packed(packed.reshape(b, t, h * 3 * 128), bias, heads=h,
                           sm_scale=sm, block_q=128, interpret=True)
    out = out.reshape(b, t, h, 128)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out[..., :d]),
                               atol=2e-5, rtol=1e-4)
    assert float(jnp.max(jnp.abs(out[..., d:]))) == 0.0
