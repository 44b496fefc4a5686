"""Offline data preparation: VAD -> clips -> ASR -> jsonl -> VQ codes.

Equivalent of the reference prepare/ pipeline
(0_vad_asr_save_to_jsonl.py + vad_process.py + asr_process.py +
5_save_vq_to_disk.py / extract_vq.py):

* Phase 1 (VAD): split on silence (-40 dBFS, 500 ms), keep 0.7-30 s clips,
  resample to 24 kHz, write wavs.  The reference used pydub's
  ``split_on_silence``; this is a numpy re-implementation of the same
  algorithm (windowed dBFS threshold, keep_silence padding).
* Phase 2 (ASR): transcribe clips and append ``{"text", "path"}`` rows to a
  jsonl.  The reference hard-codes a modelscope Paraformer-zh model; here the
  recognizer is a pluggable callable (wav, sr) -> str so any ASR engine (or
  pre-existing transcripts) can be used.  Latin-containing or too-short
  texts are dropped, as in asr_process.py:14-46.
* Phase 3 (VQ extraction): batch-encode mels to VQ codes with the jitted
  encoder and save ``.vq.npy`` beside each wav (extract_vq.py:18-46 used
  .pth files).

All phases stream via multiprocessing/thread pools like the reference's
spawn Pools (0_vad_asr:26-34).
"""
from __future__ import annotations

import json
import os
import re
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from detail_tts_tpu.data.dataset import read_wav

Recognizer = Callable[[np.ndarray, int], str]

_LATIN_RE = re.compile(r"[A-Za-z]")


# ---------------------------------------------------------------------------
# Phase 1: VAD
# ---------------------------------------------------------------------------


def _dbfs(wav: np.ndarray, frame: int) -> np.ndarray:
    """Per-frame dBFS of a float waveform (pydub semantics, RMS-based)."""
    n = len(wav) // frame
    frames = wav[: n * frame].reshape(n, frame)
    rms = np.sqrt(np.mean(frames ** 2, axis=1))
    return 20.0 * np.log10(np.maximum(rms, 1e-10))


def split_on_silence(wav: np.ndarray, sr: int, min_silence_ms: int = 500,
                     silence_thresh_db: float = -40.0,
                     keep_silence_ms: int = 100) -> List[np.ndarray]:
    """pydub ``split_on_silence`` equivalent on a float waveform."""
    frame = max(sr // 100, 1)  # 10 ms analysis frames
    db = _dbfs(wav, frame)
    silent = db < silence_thresh_db
    min_frames = max(min_silence_ms // 10, 1)
    keep = int(keep_silence_ms / 1000 * sr)

    # find silent runs >= min_frames
    chunks: List[Tuple[int, int]] = []
    start = 0
    run_start = None
    for i, s in enumerate(np.append(silent, False)):
        if s and run_start is None:
            run_start = i
        elif not s and run_start is not None:
            if i - run_start >= min_frames:
                if run_start * frame > start:
                    chunks.append((start, run_start * frame))
                start = i * frame
            run_start = None
    if len(wav) > start and not np.all(silent[start // frame:]):
        chunks.append((start, len(wav)))

    out = []
    for a, b in chunks:
        a = max(0, a - keep)
        b = min(len(wav), b + keep)
        out.append(wav[a:b])
    return out


def vad_file(path: str, out_dir: str, sr: int = 24000,
             min_secs: float = 0.7, max_secs: float = 30.0,
             silence_thresh_db: float = -40.0,
             min_silence_ms: int = 500) -> List[str]:
    """Split one file into clips; returns written paths (vad_process.py:6-30)."""
    from scipy.io import wavfile

    wav = read_wav(path, sr)
    base = os.path.splitext(os.path.basename(path))[0]
    written = []
    for i, clip in enumerate(split_on_silence(wav, sr, min_silence_ms,
                                              silence_thresh_db)):
        if not (min_secs <= len(clip) / sr <= max_secs):
            continue
        out = os.path.join(out_dir, f"{base}_{i:04d}.wav")
        wavfile.write(out, sr, (np.clip(clip, -1, 1) * 32767).astype(np.int16))
        written.append(out)
    return written


def vad_directory(in_paths: Sequence[str], out_dir: str, sr: int = 24000,
                  workers: int = 12, **kwargs) -> List[str]:
    """Phase 1 over many files with a process pool (0_vad_asr:26-30)."""
    os.makedirs(out_dir, exist_ok=True)
    written: List[str] = []
    if workers <= 1:
        for p in in_paths:
            written.extend(vad_file(p, out_dir, sr, **kwargs))
        return written
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for res in pool.map(_vad_one, [(p, out_dir, sr, kwargs)
                                       for p in in_paths]):
            written.extend(res)
    return written


def _vad_one(args):
    path, out_dir, sr, kwargs = args
    try:
        return vad_file(path, out_dir, sr, **kwargs)
    except Exception as e:  # bad files are skipped, like the reference
        print(f"vad failed for {path}: {e}")
        return []


# ---------------------------------------------------------------------------
# Phase 2: ASR -> jsonl
# ---------------------------------------------------------------------------


def asr_to_jsonl(clip_paths: Sequence[str], jsonl_path: str,
                 recognizer: Recognizer, sr: int = 24000,
                 min_chars: int = 2, drop_latin: bool = True,
                 workers: int = 4) -> int:
    """Transcribe clips and append jsonl rows (asr_process.py:14-46).

    Returns the number of rows written.  Exceptions per clip are swallowed
    (the reference does the same).
    """

    def work(path):
        try:
            wav = read_wav(path, sr)
            text = recognizer(wav, sr).strip()
            if len(text) < min_chars:
                return None
            if drop_latin and _LATIN_RE.search(text):
                return None
            return {"text": text, "path": path}
        except Exception as e:
            print(f"asr failed for {path}: {e}")
            return None

    n = 0
    with ThreadPoolExecutor(max_workers=workers) as pool, \
            open(jsonl_path, "a") as f:
        for row in pool.map(work, clip_paths):
            if row is not None:
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
                n += 1
    return n


def load_transcript_table(path: str) -> List[Tuple[str, str]]:
    """Read (clip_path, text) pairs from a transcript file.

    Accepts jsonl rows ``{"path", "text"}``, tab-separated ``path\\ttext``,
    or LJSpeech-style ``path|text`` lines.
    """
    pairs: List[Tuple[str, str]] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if line.lstrip().startswith("{"):
                row = json.loads(line)
                pairs.append((row["path"], row["text"]))
            elif "\t" in line:
                p, t = line.split("\t", 1)
                pairs.append((p, t))
            else:
                p, t = line.split("|", 1)
                pairs.append((p, t))
    return pairs


def transcripts_to_jsonl(pairs, jsonl_path: str,
                         clips_dir: Optional[str] = None,
                         min_chars: int = 2, drop_latin: bool = True) -> int:
    """Pre-existing transcripts -> jsonl rows: the ASR-phase passthrough.

    The reference hard-codes a modelscope Paraformer-zh engine
    (asr_process.py:14-46); corpora that already ship transcripts skip ASR
    entirely and feed this instead.  Applies the same row filters as
    ``asr_to_jsonl`` (min length, latin drop) plus a missing-file drop (the
    per-clip fault tolerance of the ASR phase).  ``pairs`` is an iterable of
    (path, text) or a dict; relative paths resolve against ``clips_dir``.
    Returns rows written.
    """
    if isinstance(pairs, dict):
        pairs = pairs.items()
    n = 0
    with open(jsonl_path, "a") as f:
        for path, text in pairs:
            if clips_dir is not None and not os.path.isabs(path):
                path = os.path.join(clips_dir, path)
            text = text.strip()
            if len(text) < min_chars:
                continue
            if drop_latin and _LATIN_RE.search(text):
                continue
            if not os.path.exists(path):
                print(f"transcripts: missing wav, dropping row: {path}")
                continue
            f.write(json.dumps({"text": text, "path": path},
                               ensure_ascii=False) + "\n")
            n += 1
    return n


# ---------------------------------------------------------------------------
# Phase 3: offline VQ-code extraction
# ---------------------------------------------------------------------------


def extract_vq(jsonl_path: str, cfg, variables, batch_frames: int = 4096,
               suffix: str = ".vq.npy") -> int:
    """Encode every jsonl row's mel to VQ codes; save codes beside the wav.

    Uses the jitted frozen encoder (SynthesizerTrn.encode — the
    prepare/extract_vq.py:18-46 equivalent).  Returns files written.
    """
    import jax
    import jax.numpy as jnp

    from detail_tts_tpu.audio.mel import MEL_MIN, MelFrontend
    from detail_tts_tpu.models.synthesizer import SynthesizerTrn

    model = SynthesizerTrn(cfg)
    frontend = MelFrontend(cfg.data.sampling_rate, cfg.data.filter_length,
                           cfg.data.hop_length, cfg.data.win_length,
                           cfg.data.n_mel_channels, cfg.data.mel_fmin,
                           cfg.data.mel_fmax)

    @jax.jit
    def encode(mel, length):
        # masked extraction == per-file exact-length extraction bit-for-bit
        # (the reference's offline behaviour) despite the bucket padding
        codes, _ = model.apply(variables, mel, length,
                               method=SynthesizerTrn.encode_masked)
        return codes

    # pad mel frames up to a small bucket grid before the jitted encoder:
    # one compile per bucket instead of one per distinct file length
    # (20-60 s per compile on TPU); codes past the true length are trimmed.
    bucket_step = 256  # frames (~2.7 s); max 30 s audio -> <=11 buckets

    n = skipped = 0
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            # per-row fault tolerance, like the vad/asr phases (reference
            # swallows per-item errors too, asr_process.py:44-46)
            try:
                row = json.loads(line)
                wav = read_wav(row["path"], cfg.data.sampling_rate)
                if wav is None:
                    raise IOError(f"unreadable wav: {row.get('path')}")
                n_frames = len(wav) // cfg.data.hop_length // 4 * 4
                if n_frames < 4:
                    continue
                bucket = -(-n_frames // bucket_step) * bucket_step
                mel = frontend.mel_spectrogram(jnp.asarray(wav)[None])
                # pad with the log-mel SILENCE floor, not 0.0 (a loud frame
                # in log domain): the unmasked conv stack would otherwise
                # see real activations over the pad region and perturb the
                # last couple of codes vs exact-length extraction
                mel = jnp.pad(mel[:, :n_frames],
                              ((0, 0), (0, bucket - n_frames), (0, 0)),
                              constant_values=MEL_MIN)
                codes = np.asarray(
                    encode(mel, jnp.asarray([n_frames], jnp.int32))
                )[0][: n_frames // 4]
                np.save(row["path"] + suffix, codes.astype(np.int32))
                n += 1
            except Exception as e:  # noqa: BLE001 — corpus runs must survive bad rows
                skipped += 1
                print(f"extract_vq: skipping row ({e})")
    if skipped:
        print(f"extract_vq: {skipped} rows skipped, {n} written")
    return n
