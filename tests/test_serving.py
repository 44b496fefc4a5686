"""End-to-end serving tests on the small config (virtual CPU mesh)."""
import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def _small_engine():
    cfg = small_test_config()
    ecfg = EngineConfig(
        max_generate_length=16,
        text_buckets=(16,), prompt_buckets=(32,), code_buckets=(8, 16))
    return random_engine(cfg, engine_cfg=ecfg)


def test_synthesize_batch_shapes():
    eng = _small_engine()
    sr = eng.cfg.data.sampling_rate
    rng = np.random.default_rng(0)
    wavs = [rng.uniform(-0.3, 0.3, sr).astype(np.float32) for _ in range(2)]
    outs = eng.synthesize_batch(["ni3 hao3", "shi4 jie4"], wavs,
                                rng=jax.random.PRNGKey(0), force_full=True)
    assert len(outs) == 2
    hop_per_code = eng.cfg.gpt.mel_length_compression
    for w in outs:
        assert w.ndim == 1
        assert w.shape[0] % hop_per_code == 0
        assert np.all(np.isfinite(w))
        assert np.max(np.abs(w)) <= 1.0  # tanh output
    # force_full: every utterance decodes max_generate_length-1 effective codes
    assert outs[0].shape[0] == 15 * hop_per_code


def test_synthesize_vq_path():
    eng = _small_engine()
    sr = eng.cfg.data.sampling_rate
    wav = np.random.default_rng(1).uniform(-0.3, 0.3, sr).astype(np.float32)
    outs = eng.synthesize_vq_batch(["ce4 shi4"], [wav],
                                   rng=jax.random.PRNGKey(1), force_full=True)
    assert len(outs) == 1 and np.all(np.isfinite(outs[0]))


def test_vq_roundtrip():
    eng = _small_engine()
    mel = jnp.full((1, 48, eng.cfg.data.n_mel_channels), -6.0)
    recon, wav = eng.vq_roundtrip(mel)
    assert recon.shape == mel.shape
    assert wav.shape == (1, 48 * eng.cfg.data.hop_length, 1)


def test_early_stop_lengths():
    """Without force_full, per-sequence stop masking bounds lengths."""
    eng = _small_engine()
    sr = eng.cfg.data.sampling_rate
    wav = np.random.default_rng(2).uniform(-0.3, 0.3, sr).astype(np.float32)
    text, _ = eng.prepare_text(["a"])
    refer_mel, refer_len = eng.prepare_prompt([wav])
    codes, eff = eng.generate_codes(refer_mel, refer_len, text,
                                    jax.random.PRNGKey(3))
    assert codes.shape == (1, 16)
    assert 1 <= int(eff[0]) <= 16


def test_api_cli_smoke(tmp_path, monkeypatch):
    """CLI arg wiring: --long/--sampler/--diffusion-steps/--top-p reach the
    engine; output wav written."""
    from scipy.io import wavfile

    from detail_tts_tpu.serving import api

    eng_box = {}

    def fake_build(config, ckpt, seed=0, engine_cfg=None):
        cfg = small_test_config()
        ecfg = dataclasses.replace(
            engine_cfg, max_generate_length=8, text_buckets=(16,),
            prompt_buckets=(32,), code_buckets=(8,))
        eng_box["eng"] = random_engine(cfg, engine_cfg=ecfg, fast=True)
        return eng_box["eng"]

    monkeypatch.setattr(api, "build_engine", fake_build)
    prompt_path = str(tmp_path / "p.wav")
    out_path = str(tmp_path / "o.wav")
    wav = (np.random.default_rng(0).uniform(-0.2, 0.2, 24000) * 32767)
    wavfile.write(prompt_path, 24000, wav.astype(np.int16))

    api.main(["--text", "yi1 ju4. er4 ju4.", "--prompt", prompt_path,
              "--out", out_path, "--long", "--vq-only",
              "--sampler", "ddim", "--diffusion-steps", "3",
              "--top-p", "0.9", "--temperature", "0.7"])
    sr, out = wavfile.read(out_path)
    assert sr == 24000 and len(out) > 0
    ecfg = eng_box["eng"].ecfg
    assert (ecfg.diffusion_sampler, ecfg.top_p, ecfg.temperature) == \
        ("ddim", 0.9, 0.7)
    assert eng_box["eng"].schedule.num_timesteps == 3


def test_multilingual_vocabs_through_engine():
    """en/jp/kr bundled vocabs drive the engine end-to-end (zero-shot TTS
    is language-selected purely by tokenizer vocab in the reference)."""
    from detail_tts_tpu.text.tokenizer import make_tokenizer

    cfg = small_test_config()
    ecfg = EngineConfig(max_generate_length=8, text_buckets=(16,),
                        prompt_buckets=(32,), code_buckets=(8,))
    sr = cfg.data.sampling_rate
    wav = np.random.default_rng(3).uniform(-0.3, 0.3, sr).astype(np.float32)
    texts = {"en": "hello there", "jp": "konnichiwa", "kr": "annyeong"}
    eng = random_engine(cfg, engine_cfg=ecfg, fast=True)
    for lang, text in texts.items():
        # language selection = vocab swap; jit cache shared across langs
        eng.tokenizer = make_tokenizer(lang)
        out = eng.synthesize_batch([text], [wav], rng=jax.random.PRNGKey(1),
                                   force_full=True)
        assert np.isfinite(out[0]).all() and len(out[0]) > 0, lang


def test_bias_cache_lru_and_invalidation():
    eng = _small_engine()
    b1 = eng.attention_biases(32)
    assert eng.attention_biases(32) is b1  # cached
    eng.attention_biases(64)
    assert set(eng._bias_cache) == {32, 64}
    # default cap 2: a third bucket evicts the least-recent (32)
    eng.attention_biases(32)  # refresh 32 -> 64 becomes LRU
    eng.attention_biases(96)
    assert 64 not in eng._bias_cache and 32 in eng._bias_cache
    # swapping weights invalidates
    eng.variables = dict(eng.variables)
    assert not eng._bias_cache


def test_engine_clamps_to_position_table_capacity():
    """EngineConfig defaults sized for the 24k model must not let a smaller
    model decode past its learned position tables: jnp.take fills
    out-of-range gathers with NaN, which silently corrupts the whole batch
    (the torch reference would crash on the OOB index instead).  The engine
    derives caps from GPTConfig at construction."""
    cfg = small_test_config()  # max_mel_tokens=80, max_text_tokens=40
    eng = random_engine(cfg, engine_cfg=EngineConfig(), fast=True)
    assert eng.ecfg.max_generate_length <= cfg.gpt.max_mel_tokens
    assert max(eng.ecfg.code_buckets) <= cfg.gpt.max_mel_tokens
    assert max(eng.ecfg.text_buckets) <= cfg.gpt.max_text_tokens
    # full-size model: the reference's serving settings pass through unchanged
    from detail_tts_tpu.config import Config
    full = EngineConfig()
    assert Config().gpt.max_mel_tokens >= full.max_generate_length
    # drive the worst case end-to-end: force a full-length decode with the
    # DEFAULT engine config on the tiny model; output must be finite
    sr = cfg.data.sampling_rate
    wav = np.random.default_rng(7).uniform(-0.3, 0.3, sr).astype(np.float32)
    outs = eng.synthesize_batch(["ni3 hao3 shi4 jie4"], [wav],
                                rng=jax.random.PRNGKey(0), force_full=True)
    assert np.isfinite(outs[0]).all() and len(outs[0]) > 0
