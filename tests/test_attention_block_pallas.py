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
