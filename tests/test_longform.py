"""Long-form chunking + crossfade concat + samplers."""
import pytest

import numpy as np

from detail_tts_tpu.serving.longform import crossfade_concat, split_sentences

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def test_split_sentences():
    text = "你好世界。这是第二句！短。This is a test? 好的"
    parts = split_sentences(text)
    assert parts == ["你好世界。", "这是第二句！", "短。", "This is a test?",
                     "好的"]


def test_split_overlong_on_commas():
    text = "a" * 50 + "，" + "b" * 50 + "，" + "c" * 50
    parts = split_sentences(text, max_chars=80)
    assert all(len(p) <= 80 for p in parts)
    assert "".join(p.rstrip("，") for p in parts).replace("，", "") == \
        "a" * 50 + "b" * 50 + "c" * 50


def test_crossfade_concat_length():
    sr = 24000
    a = np.ones(sr, np.float32)
    b = np.ones(sr, np.float32) * -1
    out = crossfade_concat([a, b], sr, fade_ms=20)
    n_fade = int(sr * 0.02)
    assert len(out) == 2 * sr - n_fade
    assert np.all(np.abs(out) <= 1.0)


def test_longform_e2e():
    import jax

    from detail_tts_tpu.config import small_test_config
    from detail_tts_tpu.serving.longform import synthesize_long
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    eng = random_engine(small_test_config(), engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(16,), prompt_buckets=(32,),
        code_buckets=(8,)), fast=True)
    prompt = np.random.default_rng(0).uniform(-0.3, 0.3, 24000).astype(
        np.float32)
    wav = synthesize_long(eng, "yi1 ju4. er4 ju4!", prompt,
                          rng=jax.random.PRNGKey(0), vq_only=True)
    assert wav.ndim == 1 and len(wav) > 0 and np.all(np.isfinite(wav))


def test_longform_stream_matches_batch():
    """Concatenated stream yields == one-shot synthesize_long (same rng)."""
    import jax

    from detail_tts_tpu.config import small_test_config
    from detail_tts_tpu.serving.longform import (synthesize_long,
                                                 synthesize_long_stream)
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    eng = random_engine(small_test_config(), engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(16,), prompt_buckets=(32,),
        code_buckets=(8,)), fast=True)
    prompt = np.random.default_rng(1).uniform(-0.3, 0.3, 24000).astype(
        np.float32)
    text = "yi1 ju4. er4 ju4! san1 ju4? si4 ju4."  # 4 chunks, 2 batches
    full = synthesize_long(eng, text, prompt, rng=jax.random.PRNGKey(7),
                           batch_size=2, vq_only=True)
    parts = list(synthesize_long_stream(eng, text, prompt,
                                        rng=jax.random.PRNGKey(7),
                                        batch_size=2, vq_only=True))
    assert len(parts) >= 2  # streaming actually yields before the end
    np.testing.assert_array_equal(np.concatenate(parts), full)
