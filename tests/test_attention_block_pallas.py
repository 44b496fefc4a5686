"""AttentionBlock pallas path (weight-folded pad + kernel) vs XLA path.

Runs the pallas path in interpret mode on CPU — exercises the exact code the
TPU serving path uses, including the qkv weight padding and transposes.
"""
import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.nn.diff_blocks import AttentionBlock


def test_pallas_path_matches_xla_path():
    from tests.test_pallas_attention import LOG2E, randomize

    blk = AttentionBlock(channels=96, num_heads=2, relative_pos_embeddings=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 200, 96)),
                    jnp.float32)
    variables = randomize(blk.init(jax.random.PRNGKey(0), x))
    # precomputed biases are log2-domain by contract
    bias = blk.apply(variables, 200, method=AttentionBlock.bias_values) * LOG2E

    y_xla = blk.apply(variables, x, None, bias, False)
    assert float(jnp.abs(y_xla - x).max()) > 1e-3  # non-identity block
    y_pallas = blk.apply(variables, x, None, bias, True)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_pallas),
                               atol=5e-4, rtol=2e-3)


def test_pallas_paired_vs_unpaired_paths(monkeypatch):
    """ch=48, even heads: the default paired-lane packing must match the
    one-head-per-128-lane packing bit-for-bit up to reduction order."""
    from tests.test_pallas_attention import LOG2E, randomize

    blk = AttentionBlock(channels=96, num_heads=2, relative_pos_embeddings=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 200, 96)),
                    jnp.float32)
    variables = randomize(blk.init(jax.random.PRNGKey(1), x))
    bias = blk.apply(variables, 200, method=AttentionBlock.bias_values) * LOG2E

    monkeypatch.setenv("DTTS_ATTN_PAIRED", "1")
    y_paired = blk.apply(variables, x, None, bias, True)
    monkeypatch.setenv("DTTS_ATTN_PAIRED", "0")
    y_unpaired = blk.apply(variables, x, None, bias, True)
    np.testing.assert_allclose(np.asarray(y_paired), np.asarray(y_unpaired),
                               atol=2e-5, rtol=1e-4)
