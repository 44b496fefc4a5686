"""Pallas row-block attention kernel vs the XLA reference path (interpret
mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.ops.pallas.attention import attention


def _xla_attention(q, k, v, bias, sm_scale):
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) * sm_scale + bias[None]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


def test_kernel_matches_xla_exact_shapes():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 4, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, t, t)), jnp.float32)
    sm = 1.0 / np.sqrt(d)
    ref = _xla_attention(q, k, v, bias, sm)
    out = attention(q, k, v, bias, sm_scale=sm, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-4)


def test_kernel_padded_shapes():
    """T not a block multiple, D=48 (the diffusion head dim)."""
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 200, 48
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, t, t)), jnp.float32)
    sm = 1.0 / np.sqrt(d)
    ref = _xla_attention(q, k, v, bias, sm)
    out = attention(q, k, v, bias, sm_scale=sm, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-4)


def randomize(variables, seed=7, scale=0.3):
    """Perturb ALL params (proj_out is zero-init, which would make
    AttentionBlock an identity and the comparison vacuous)."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [l + scale * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])


LOG2E = 1.4426950408889634


def test_attention_block_precomputed_bias_matches_inline():
    """AttentionBlock with hoisted (log2-domain) bias == in-call bias."""
    from detail_tts_tpu.nn.diff_blocks import AttentionBlock

    blk = AttentionBlock(channels=64, num_heads=4, relative_pos_embeddings=True)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 40, 64)),
                    jnp.float32)
    variables = randomize(blk.init(jax.random.PRNGKey(0), x))
    y_inline = blk.apply(variables, x)
    assert float(jnp.abs(y_inline - x).max()) > 1e-3  # non-identity block
    # precomputed biases are log2-domain (DiffusionTts.attention_biases)
    bias = blk.apply(variables, 40, method=AttentionBlock.bias_values) * LOG2E
    y_pre = blk.apply(variables, x, None, bias)
    np.testing.assert_allclose(np.asarray(y_inline), np.asarray(y_pre),
                               atol=1e-5)


def test_packed_sum_lane_matches_vpu_sum():
    """MXU-denominator mode (ones planted in a v padding lane) must equal
    the in-kernel VPU row-reduce."""
    from detail_tts_tpu.ops.pallas.attention import attention_packed

    rng = np.random.default_rng(5)
    b, h, t, d, dp = 2, 2, 96, 48, 128
    qkv = np.zeros((b, t, h * 3 * dp), np.float32)
    full = rng.normal(size=(b, t, h, 3, d)).astype(np.float32)
    qkv_r = qkv.reshape(b, t, h, 3, dp)
    qkv_r[..., :d] = full
    qkv_ones = qkv_r.copy()
    qkv_ones[:, :, :, 2, d] = 1.0  # the planted denominator lane
    bias = jnp.asarray(rng.normal(size=(h, t, t)), jnp.float32)
    sm = 1.0 / np.sqrt(d)

    ref = attention_packed(jnp.asarray(qkv_r.reshape(b, t, -1)), bias,
                           heads=h, sm_scale=sm, block_q=48, interpret=True)
    out = attention_packed(jnp.asarray(qkv_ones.reshape(b, t, -1)), bias,
                           heads=h, sm_scale=sm, block_q=48, interpret=True,
                           sum_lane=d)
    r = np.asarray(ref).reshape(b, t, h, dp)[..., :d]
    o = np.asarray(out).reshape(b, t, h, dp)[..., :d]
    np.testing.assert_allclose(r, o, atol=2e-5, rtol=1e-4)
