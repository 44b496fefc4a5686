"""Trainable pallas attention (custom VJP): forward + all four gradients
against the XLA einsum reference (interpret mode on CPU)."""
import pytest

import math

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.ops.pallas.attention import attention_train_padded

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def _reference(q, k, v, bias, sm_scale):
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) * sm_scale + bias[None]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", w, v.astype(jnp.float32))


def test_attention_train_fwd_and_grads_match_reference():
    rng = np.random.default_rng(41)
    b, h, t, d = 2, 3, 72, 48  # t not a block multiple, d padded to 64
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 2, (h, t, t)).astype(np.float32))
    sm_scale = 1.0 / math.sqrt(d)
    # a fixed cotangent makes the VJP comparison deterministic
    ct = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference(q, k, v, bias, sm_scale) * ct)

    def loss_ker(q, k, v, bias):
        return jnp.sum(attention_train_padded(
            q, k, v, bias, sm_scale=sm_scale, block_q=40,
            interpret=True) * ct)

    out_ref = _reference(q, k, v, bias, sm_scale)
    out_ker = attention_train_padded(q, k, v, bias, sm_scale=sm_scale,
                                     block_q=40, interpret=True)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_ker),
                               atol=2e-5, rtol=1e-4)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, bb in zip(("dq", "dk", "dv", "dbias"), g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_attention_train_masked_columns():
    """-1e9 bias columns (padding convention) zero their weights and grads."""
    rng = np.random.default_rng(43)
    b, h, t, d = 1, 1, 16, 64
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    bias = jnp.zeros((h, t, t), jnp.float32).at[:, :, t // 2:].set(-1e9)

    def f(v):
        return jnp.sum(attention_train_padded(
            q, k, v, bias, sm_scale=0.125, block_q=16, interpret=True))

    dv = jax.grad(f)(v)
    # masked keys receive no probability mass -> zero dv rows
    np.testing.assert_allclose(np.asarray(dv[0, 0, t // 2:]), 0.0, atol=1e-6)
    assert float(jnp.abs(dv[0, 0, : t // 2]).sum()) > 0
