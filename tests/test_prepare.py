"""Data-prep pipeline tests: numpy VAD, ASR jsonl, typical sampling."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.data.prepare import (asr_to_jsonl, split_on_silence,
                                         vad_file)


def _speechy(sr, secs, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-0.5, 0.5, int(secs * sr))).astype(np.float32)


def test_split_on_silence():
    sr = 24000
    sil = np.zeros(int(0.8 * sr), np.float32)
    a, b = _speechy(sr, 1.2, 0), _speechy(sr, 2.0, 1)
    wav = np.concatenate([sil, a, sil, b, sil])
    chunks = split_on_silence(wav, sr, min_silence_ms=500,
                              silence_thresh_db=-40.0, keep_silence_ms=0)
    assert len(chunks) == 2
    assert abs(len(chunks[0]) - len(a)) < sr // 10
    assert abs(len(chunks[1]) - len(b)) < sr // 10


def test_vad_file_duration_filter(tmp_path):
    from scipy.io import wavfile

    sr = 24000
    sil = np.zeros(int(0.8 * sr), np.float32)
    short = _speechy(sr, 0.2)      # < 0.7s -> dropped
    good = _speechy(sr, 1.5)
    wav = np.concatenate([short, sil, good, sil])
    src = str(tmp_path / "src.wav")
    wavfile.write(src, sr, (wav * 32767).astype(np.int16))
    out = vad_file(src, str(tmp_path), sr=sr)
    assert len(out) == 1


def test_asr_to_jsonl_filters(tmp_path):
    from scipy.io import wavfile

    sr = 24000
    paths = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.wav")
        wavfile.write(p, sr, (_speechy(sr, 1.0, i) * 32767).astype(np.int16))
        paths.append(p)

    texts = {0: "你好世界", 1: "with LATIN", 2: "短"}
    calls = {"i": -1}

    def rec(wav, sr_):
        calls["i"] += 1
        return texts[calls["i"]]

    jsonl = str(tmp_path / "d.jsonl")
    n = asr_to_jsonl(paths, jsonl, rec, workers=1)
    rows = [json.loads(l) for l in open(jsonl)]
    # latin-containing and 1-char rows are dropped (asr_process.py:14-46)
    assert n == len(rows) == 1


def test_typical_sampling_filters_atypical():
    from detail_tts_tpu.ops.sampling import apply_typical

    logits = jnp.asarray([[4.0, 3.9, 3.8, -8.0, -9.0]])
    out = apply_typical(logits, mass=0.9)
    # the high-probability, near-entropy tokens survive; outliers masked
    assert bool(jnp.isfinite(out[0, 0]))
    assert not bool(jnp.isfinite(out[0, 4]))
