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


def _pack_pairs(full, d, dh=64, dp=128):
    """(B,T,H,3,d) -> (B,T,(H//2)*3*128) in the paired lane layout."""
    b, t, h, _, _ = full.shape
    arr = np.zeros((b, t, h, 3, dh), np.float32)
    arr[..., :d] = full
    # [pair][q|k|v][parity 0|1][64]
    arr = arr.reshape(b, t, h // 2, 2, 3, dh).transpose(0, 1, 2, 4, 3, 5)
    return arr.reshape(b, t, h // 2 * 3 * dp)


def test_paired_kernel_matches_xla():
    from detail_tts_tpu.ops.pallas.attention import attention_packed_pairs

    rng = np.random.default_rng(11)
    b, h, t, d = 2, 4, 96, 48
    full = rng.normal(size=(b, t, h, 3, d)).astype(np.float32)
    bias = jnp.asarray(rng.normal(size=(h, t, t)), jnp.float32)
    sm = 1.0 / np.sqrt(d)

    q = jnp.asarray(full[..., 0, :].transpose(0, 2, 1, 3))  # (B,H,T,d)
    k = jnp.asarray(full[..., 1, :].transpose(0, 2, 1, 3))
    v = jnp.asarray(full[..., 2, :].transpose(0, 2, 1, 3))
    ref = _xla_attention(q, k, v, bias, sm)                  # (B,H,T,d)

    out = attention_packed_pairs(jnp.asarray(_pack_pairs(full, d)), bias,
                                 heads=h, sm_scale=sm, block_q=48,
                                 interpret=True)             # (B,T,H//2*128)
    o = np.asarray(out).reshape(b, t, h, 64)[..., :d].transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ref), o, atol=2e-5, rtol=1e-4)


def test_paired_kernel_padded_t():
    """T not a block multiple: padded key columns must not leak weight."""
    from detail_tts_tpu.ops.pallas.attention import attention_packed_pairs

    rng = np.random.default_rng(12)
    b, h, t, d = 1, 2, 70, 48
    full = rng.normal(size=(b, t, h, 3, d)).astype(np.float32)
    bias = jnp.asarray(rng.normal(size=(h, t, t)), jnp.float32)
    sm = 1.0 / np.sqrt(d)
    q = jnp.asarray(full[..., 0, :].transpose(0, 2, 1, 3))
    k = jnp.asarray(full[..., 1, :].transpose(0, 2, 1, 3))
    v = jnp.asarray(full[..., 2, :].transpose(0, 2, 1, 3))
    ref = _xla_attention(q, k, v, bias, sm)
    out = attention_packed_pairs(jnp.asarray(_pack_pairs(full, d)), bias,
                                 heads=h, sm_scale=sm, block_q=64,
                                 interpret=True)
    o = np.asarray(out).reshape(b, t, h, 64)[..., :d].transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(ref), o, atol=2e-5, rtol=1e-4)


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


def test_no_max_softmax_extreme_logits_finite():
    """The NO-MAX exp2 softmax clamps at 2^100 instead of subtracting the
    row max.  Extreme positive logits (far beyond any real activation
    scale) must saturate to a uniform distribution over the clamped
    columns — never overflow to inf/NaN — and strongly negative rows must
    underflow to exactly 0 (the +1e-30 denominator guard), not NaN."""
    b, h, t, d = 1, 2, 128, 64
    q = jnp.ones((b, h, t, d), jnp.float32) * 30.0
    k = jnp.ones((b, h, t, d), jnp.float32) * 30.0
    v = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32)[None, None, :, None],
                         (b, h, t, d))
    # head 0: huge positive logits (qk ~ 900*d, way past the 2^100 clamp);
    # head 1: -1e9 bias everywhere = a fully-suppressed row
    bias = jnp.stack([jnp.zeros((t, t), jnp.float32),
                      jnp.full((t, t), -1e9, jnp.float32)])
    out = attention(q, k, v, bias, sm_scale=1.0 / np.sqrt(d), interpret=True)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # clamped-uniform head: softmax over equal (clamped) logits = mean of v
    np.testing.assert_allclose(o[0, 0], np.asarray(v)[0, 0].mean(0)[None]
                               * np.ones((t, d), np.float32), rtol=1e-5)
    # fully-suppressed head: weights underflow to 0 -> output exactly 0
    np.testing.assert_allclose(o[0, 1], 0.0)
