"""Sharded serving: engine on an 8-device (4x2) CPU mesh."""
import jax
import numpy as np

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.parallel.mesh import make_mesh
from detail_tts_tpu.serving.pipeline import (EngineConfig, TTSEngine,
                                             fast_random_variables)


def test_sharded_synthesis():
    cfg = small_test_config()
    mesh = make_mesh(data=4, model=2)
    variables = fast_random_variables(cfg, seed=0)
    ecfg = EngineConfig(max_generate_length=8, text_buckets=(16,),
                        prompt_buckets=(32,), code_buckets=(8,),
                        compute_dtype=None)
    eng = TTSEngine(cfg, variables, ecfg, mesh=mesh)

    rng = np.random.default_rng(0)
    wavs = [rng.uniform(-0.3, 0.3, 24000).astype(np.float32)
            for _ in range(4)]
    with mesh:
        outs = eng.synthesize_batch(["yi1", "er4", "san1", "si4"], wavs,
                                    rng=jax.random.PRNGKey(0),
                                    force_full=True)
    assert len(outs) == 4
    for w in outs:
        assert np.all(np.isfinite(w))
