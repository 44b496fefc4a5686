"""Sharded serving: engine on an 8-device (4x2) CPU mesh."""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.parallel.mesh import make_mesh
from detail_tts_tpu.serving.pipeline import (EngineConfig, TTSEngine,
                                             fast_random_variables)

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


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


def _deterministic_tail(eng: TTSEngine, mesh=None):
    """Fixed codes -> (latents, diffused mel, wav) through the engine's
    deterministic tail stages (fixed rngs; the AR decode is bypassed so TP
    tiling jitter cannot flip a sampled token and mask a real TP rule bug)."""
    rng = np.random.default_rng(1)
    wavs = [rng.uniform(-0.3, 0.3, 24000).astype(np.float32)
            for _ in range(4)]
    text, _ = eng.prepare_text(["yi1", "er4 san1", "si4", "wu3 liu4"])
    refer_mel, refer_len = eng.prepare_prompt(wavs)
    codes = jnp.asarray(rng.integers(0, 20, size=(4, 8)), jnp.int32)
    eff = np.array([6, 8, 5, 8], np.int32)
    with (mesh if mesh is not None else contextlib.nullcontext()):
        if mesh is not None:
            text, refer_mel, refer_len, codes = eng._shard(
                text, refer_mel, refer_len, codes)
        codes_b, wav_len, bucket = eng._pad_codes(codes, eff)
        latents = eng._latents(eng.variables, refer_mel, refer_len, text,
                               codes_b, wav_len)
        diff_cond = eng.diffusion_cond(refer_mel, refer_len)
        biases = eng.attention_biases(bucket * FRAMES_PER_CODE)
        mel = eng._diffuse(eng.variables, latents, diff_cond, biases,
                           jax.random.PRNGKey(7))
        wav = eng._vocode(eng.variables, mel,
                          jnp.asarray(eff * FRAMES_PER_CODE, jnp.int32),
                          jax.random.PRNGKey(8))
    return (np.asarray(latents), np.asarray(mel), np.asarray(wav[..., 0]))


def test_mesh_vs_single_device_parity():
    """The 4x2-mesh engine must produce the SAME stage outputs as the
    unsharded engine — `isfinite` alone would let a TP partition rule that
    mangles values into plausible garbage pass (reference semantics being
    certified: the whole infer tail, model_24k.py:774-810)."""
    cfg = small_test_config()
    variables = fast_random_variables(cfg, seed=0)
    ecfg = EngineConfig(max_generate_length=8, text_buckets=(16,),
                        prompt_buckets=(32,), code_buckets=(8,),
                        compute_dtype=None)
    single = _deterministic_tail(TTSEngine(cfg, variables, ecfg))
    mesh = make_mesh(data=4, model=2)
    sharded = _deterministic_tail(
        TTSEngine(cfg, variables, ecfg, mesh=mesh), mesh=mesh)
    for name, a, b, tol in [
        ("latents", single[0], sharded[0], 2e-4),
        ("mel", single[1], sharded[1], 2e-3),
        ("wav", single[2], sharded[2], 2e-3),
    ]:
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            b, a, atol=tol * scale, rtol=0,
            err_msg=f"mesh-vs-single mismatch in {name}")
