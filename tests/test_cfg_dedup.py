"""CFG-deduped diffusion forward == flag-based forward (exact)."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.models.diffusion_model import DiffusionTts

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below


def test_cfg_call_matches_flagged_call():
    cfg = small_test_config().diffusion
    model = DiffusionTts(cfg)
    rng = np.random.default_rng(0)
    b, t_code = 2, 8
    t_mel = t_code * 4
    x = jnp.asarray(rng.normal(size=(b, t_mel, cfg.in_channels)), jnp.float32)
    latents = jnp.asarray(rng.normal(size=(b, t_code, cfg.in_latent_channels)),
                          jnp.float32)
    refer = jnp.asarray(rng.normal(-6, 2, (b, 24, cfg.in_channels)),
                        jnp.float32)
    t = jnp.asarray([7, 7], jnp.int32)

    def init_all(m, x, t, latents, refer):
        cond = m.get_conditioning(refer)
        return m(x, t, aligned_latent=latents, conditioning_latent=cond)

    variables = model.init(jax.random.PRNGKey(0), x, t, latents, refer,
                           method=init_all)

    cond_latent = model.apply(variables, refer,
                              method=DiffusionTts.get_conditioning)
    code_emb = model.apply(variables, latents, cond_latent, t_mel,
                           method=DiffusionTts.timestep_independent)

    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    flags = jnp.asarray([False] * b + [True] * b)
    ref = model.apply(variables, x2, t2, precomputed_embeddings=jnp.concatenate(
        [code_emb, code_emb], axis=0), conditioning_free=flags)
    out = model.apply(variables, x2, t2, code_emb,
                      method=DiffusionTts.cfg_call)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-4)
