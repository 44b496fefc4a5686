"""Data-prep pipeline tests: numpy VAD, ASR jsonl, typical sampling."""
import pytest

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.data.prepare import (asr_to_jsonl, split_on_silence,
                                         vad_file)

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below


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


def test_transcripts_passthrough(tmp_path):
    """ASR-phase passthrough: same filters, missing-wav drop, table formats."""
    from scipy.io import wavfile

    from detail_tts_tpu.data.prepare import (load_transcript_table,
                                             transcripts_to_jsonl)

    sr = 24000
    for name in ("a.wav", "b.wav"):
        wavfile.write(str(tmp_path / name), sr,
                      (_speechy(sr, 1.0) * 32767).astype(np.int16))

    table = str(tmp_path / "meta.tsv")
    with open(table, "w") as f:
        f.write("a.wav\t你好世界\n")        # kept
        f.write("b.wav\thas LATIN text\n")  # dropped: latin
        f.write("a.wav\t短\n")              # dropped: < min_chars
        f.write("missing.wav\t这条没有音频\n")  # dropped: no wav

    jsonl = str(tmp_path / "d.jsonl")
    n = transcripts_to_jsonl(load_transcript_table(table), jsonl,
                             clips_dir=str(tmp_path))
    rows = [json.loads(l) for l in open(jsonl)]
    assert n == len(rows) == 1
    assert rows[0]["text"] == "你好世界"
    assert rows[0]["path"] == str(tmp_path / "a.wav")

    # the other two table formats parse to the same pairs
    ljs = str(tmp_path / "meta.csv")
    with open(ljs, "w") as f:
        f.write("a.wav|你好世界\n")
    jl = str(tmp_path / "meta.jsonl")
    with open(jl, "w") as f:
        f.write(json.dumps({"path": "a.wav", "text": "你好世界"},
                           ensure_ascii=False) + "\n")
    assert (load_transcript_table(ljs) == load_transcript_table(jl)
            == [("a.wav", "你好世界")])


@pytest.mark.slow  # ~2-4 min: builds a serving engine / jits the extraction program
def test_extract_vq_bucket_padding_matches_exact(tmp_path):
    """Bucketed (silence-floor padded) extraction returns the SAME codes as
    exact-length extraction: with 0.0 padding (a loud log-mel frame) the
    unmasked conv stack perturbs the trailing codes — the MEL_MIN pad fix
    keeps the boundary clean (advisor round-2 finding)."""
    from scipy.io import wavfile

    from detail_tts_tpu.audio.mel import MelFrontend
    from detail_tts_tpu.config import small_test_config
    from detail_tts_tpu.data.prepare import extract_vq
    from detail_tts_tpu.models.synthesizer import SynthesizerTrn
    from detail_tts_tpu.train.step import init_variables

    cfg = small_test_config()
    model = SynthesizerTrn(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0), weight_norm=False)

    sr = cfg.data.sampling_rate
    # an awkward length: far from the 256-frame bucket boundary
    wav = _speechy(sr, 1.37, seed=7) * 0.5
    path = str(tmp_path / "a.wav")
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    jsonl = str(tmp_path / "d.jsonl")
    with open(jsonl, "w") as f:
        f.write(json.dumps({"path": path, "text": "yi1"}) + "\n")

    n = extract_vq(jsonl, cfg, variables)
    assert n == 1
    bucketed = np.load(path + ".vq.npy")

    # exact-length oracle: no padding at all
    frontend = MelFrontend(cfg.data.sampling_rate, cfg.data.filter_length,
                           cfg.data.hop_length, cfg.data.win_length,
                           cfg.data.n_mel_channels, cfg.data.mel_fmin,
                           cfg.data.mel_fmax)
    wav_read = wavfile.read(path)[1].astype(np.float32) / 32768.0
    n_frames = len(wav_read) // cfg.data.hop_length // 4 * 4
    mel = frontend.mel_spectrogram(jnp.asarray(wav_read)[None])[:, :n_frames]
    exact, _ = model.apply(variables, mel, method=SynthesizerTrn.encode)
    exact = np.asarray(exact)[0]

    assert bucketed.shape == exact.shape
    np.testing.assert_array_equal(bucketed, exact)


@pytest.mark.slow  # ~1.5 min: jits the small-model VQ extraction in a subprocess
def test_prepare_demo_end_to_end(tmp_path):
    """examples/prepare_demo.py runs every prep phase (VAD -> transcripts
    passthrough -> VQ extraction -> one training batch) on a tiny corpus."""
    import subprocess
    import sys

    from scipy.io import wavfile

    sr = 24000
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    sil = np.zeros(int(0.8 * sr), np.float32)
    wav = np.concatenate([sil, _speechy(sr, 1.5, 0), sil,
                          _speechy(sr, 2.0, 1), sil])
    wavfile.write(str(raw_dir / "rec.wav"), sr,
                  (wav * 32767).astype(np.int16))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "prepare_demo.py"),
         "--in-dir", str(raw_dir), "--work-dir", str(tmp_path / "work"),
         "--cpu", "--small"],
        capture_output=True, text=True, timeout=600, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[4/4] batch:" in out.stdout, out.stdout
    assert (tmp_path / "work" / "data.jsonl").exists()
    import glob as _glob

    assert _glob.glob(str(tmp_path / "work" / "clips" / "*.vq.npy"))


def test_typical_sampling_filters_atypical():
    from detail_tts_tpu.ops.sampling import apply_typical

    logits = jnp.asarray([[4.0, 3.9, 3.8, -8.0, -9.0]])
    out = apply_typical(logits, mass=0.9)
    # the high-probability, near-entropy tokens survive; outliers masked
    assert bool(jnp.isfinite(out[0, 0]))
    assert not bool(jnp.isfinite(out[0, 4]))


@pytest.mark.slow  # ~6 min: two 2-step training stages + serving, subprocess
def test_lifecycle_demo_end_to_end(tmp_path):
    """examples/lifecycle_demo.py chains the whole user path: prepare
    (VAD -> jsonl) -> vqvae stage -> gpt stage grown from its checkpoint
    -> TTSEngine serving from the trained Orbax ckpt.  --vq-only keeps the
    serve phase lean (full-diffusion serving is covered by test_serving)."""
    import subprocess
    import sys

    from scipy.io import wavfile

    sr = 24000
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    sil = np.zeros(int(0.8 * sr), np.float32)
    wav = np.concatenate([sil, _speechy(sr, 1.5, 0), sil,
                          _speechy(sr, 2.0, 1), sil, _speechy(sr, 1.2, 2),
                          sil])
    wavfile.write(str(raw_dir / "rec.wav"), sr,
                  (wav * 32767).astype(np.int16))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "lifecycle_demo.py"),
         "--in-dir", str(raw_dir), "--work-dir", str(tmp_path / "work"),
         "--cpu", "--small", "--steps", "2", "--vq-only"],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    # every phase line printed, checkpoints + final audio on disk
    for tag in ("[1/4] prepare:", "[2/4] train vqvae:",
                "[3/4] train gpt (grown from vqvae ckpt):",
                "[4/4] serve: wrote"):
        assert tag in out.stdout, out.stdout
    assert (tmp_path / "work" / "train_vqvae" / "ckpt").is_dir()
    assert (tmp_path / "work" / "train_gpt" / "ckpt").is_dir()
    wav_path = tmp_path / "work" / "lifecycle.wav"
    sr2, pcm = wavfile.read(str(wav_path))
    assert sr2 == sr and pcm.size > 0


@pytest.mark.slow  # ~2 min: builds a small serving engine in a subprocess
def test_demo_small_end_to_end(tmp_path):
    """examples/demo.py --small: the reference demo.ipynb flow (zero-shot
    diffusion path + diffusion-free VQ path + long-form chunking) through
    a small random-weight engine, at the script level."""
    import subprocess
    import sys

    from scipy.io import wavfile

    sr = 24000
    prompt = str(tmp_path / "prompt.wav")
    wavfile.write(prompt, sr, (_speechy(sr, 2.0, 0) * 32767).astype(np.int16))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "demo.py"),
         "--prompt", prompt, "--small", "--cpu",
         "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    for name in ("demo_full.wav", "demo_vq.wav", "demo_long.wav"):
        assert f"{name}:" in out.stdout, out.stdout
        sr2, pcm = wavfile.read(str(tmp_path / name))
        assert sr2 == sr and pcm.size > 0, name
    # long-form chunks 3 sentences and crossfades: strictly more audio
    n_full = wavfile.read(str(tmp_path / "demo_full.wav"))[1].size
    n_long = wavfile.read(str(tmp_path / "demo_long.wav"))[1].size
    assert n_long > n_full


def test_prepare_cli_subcommands(tmp_path, monkeypatch, capsys):
    """prepare_cli end-to-end at the CLI layer: vad -> asr (stub recognizer
    module) -> transcripts passthrough.  extract-vq needs a checkpoint and is
    covered via the library call in test_prepare_demo_end_to_end."""
    import sys

    from scipy.io import wavfile

    from detail_tts_tpu.data.prepare_cli import main

    sr = 24000
    raw_dir, clips_dir = tmp_path / "raw", tmp_path / "clips"
    raw_dir.mkdir()
    sil = np.zeros(int(0.8 * sr), np.float32)
    wav = np.concatenate([sil, _speechy(sr, 1.2, 0), sil,
                          _speechy(sr, 2.0, 1), sil])
    wavfile.write(str(raw_dir / "rec.wav"), sr, (wav * 32767).astype(np.int16))

    main(["vad", "--in-dir", str(raw_dir), "--out-dir", str(clips_dir),
          "--workers", "1"])
    clips = sorted(os.listdir(clips_dir))
    assert len(clips) == 2 and "wrote 2 clips" in capsys.readouterr().out

    # asr: stub recognizer module resolved via --recognizer import path
    stub_dir = tmp_path / "stub"
    stub_dir.mkdir()
    (stub_dir / "fake_asr.py").write_text(
        "def transcribe(wav, sr):\n    return '你好世界测试'\n")
    monkeypatch.syspath_prepend(str(stub_dir))
    asr_jsonl = str(tmp_path / "asr.jsonl")
    main(["asr", "--clips-dir", str(clips_dir), "--jsonl", asr_jsonl,
          "--recognizer", "fake_asr", "--workers", "1"])
    rows = [json.loads(l) for l in open(asr_jsonl)]
    assert len(rows) == 2 and all(r["text"] == "你好世界测试" for r in rows)

    # transcripts passthrough: LJSpeech-style '|' table, relative paths
    table = tmp_path / "meta.txt"
    table.write_text("".join(f"{c}|第{i}句转写文本\n"
                             for i, c in enumerate(clips)))
    tr_jsonl = str(tmp_path / "tr.jsonl")
    main(["transcripts", "--table", str(table), "--jsonl", tr_jsonl,
          "--clips-dir", str(clips_dir)])
    rows = [json.loads(l) for l in open(tr_jsonl)]
    assert [r["text"] for r in rows] == ["第0句转写文本", "第1句转写文本"]
    assert all(os.path.isabs(r["path"]) and os.path.exists(r["path"])
               for r in rows)
