"""Training data pipeline: jsonl dataset -> bucketed, padded device batches.

Behavioural equivalent of the reference dataset/collate
(vqvae/dataset_24k.py:43-272):

* jsonl rows ``{"path": wav, "text": zh}``; pinyin(TONE3, neutral 5) + BPE;
* 24 kHz resample; duration filter 0.69-30.1 s (dataset_24k.py:124);
* linear spec + log-mel; length //4*4 alignment trim (:155);
* random 496-frame crop when >500 frames, keeping full "raw_*" copies (:162);
* 12-key padded batch dict (:258-272).

TPU-first differences:
* lengths are padded UP to configurable buckets (bounds recompiles under
  jit; the reference pads to the per-batch max -> a new CUDA graph per max);
* spec/mel come from the jittable JAX frontend executed on host CPU in one
  batched call per item (the reference runs per-item torch.stft in 16 worker
  processes);
* background prefetch threads + a bounded queue replace DataLoader workers;
* the file list is sharded by ``jax.process_index()`` for multi-host.
"""
from __future__ import annotations

import dataclasses
import json
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from detail_tts_tpu.audio.mel import MelFrontend
from detail_tts_tpu.config import Config
from detail_tts_tpu.text.pinyin import to_pinyin


def read_wav(path: str, target_sr: int) -> Optional[np.ndarray]:
    """Load mono float32 at ``target_sr``.

    Fast path: the native C++ decoder (WAV parse + polyphase resample,
    GIL-free — see native/).  Fallbacks: soundfile, then scipy.
    """
    if path.lower().endswith(".wav"):
        from detail_tts_tpu.native import load_wav_native

        wav = load_wav_native(path, target_sr)
        if wav is not None:
            return wav
    try:
        import soundfile as sf  # optional

        wav, sr = sf.read(path, dtype="float32", always_2d=True)
        wav = wav[:, 0]
    except ImportError:
        from scipy.io import wavfile

        sr, wav = wavfile.read(path)
        wav = np.asarray(wav)
        if wav.ndim > 1:
            wav = wav[:, 0]
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        else:
            wav = wav.astype(np.float32)
    if sr != target_sr:
        import scipy.signal as sps

        g = np.gcd(sr, target_sr)
        wav = sps.resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
    return wav


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Padding buckets (frame counts; all multiples of 4)."""

    crop_frames: int = 496          # dataset_24k.py:162-167
    crop_threshold: int = 500
    raw_buckets: Sequence[int] = (512, 1024, 1536, 2048, 2560, 2824)
    text_buckets: Sequence[int] = (32, 64, 128, 256, 512, 800)

    def bucket(self, n: int, buckets: Sequence[int]) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]


class JsonlTtsDataset:
    """Random-access decoded samples (host-side, pure numpy)."""

    def __init__(self, cfg: Config, jsonl_path: str, tokenizer,
                 min_secs: float = 0.69, max_secs: float = 30.1,
                 seed: int = 1234, shard: bool = True):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.min_secs, self.max_secs = min_secs, max_secs
        self.frontend = MelFrontend(
            cfg.data.sampling_rate, cfg.data.filter_length,
            cfg.data.hop_length, cfg.data.win_length, cfg.data.n_mel_channels,
            cfg.data.mel_fmin, cfg.data.mel_fmax)
        rows: List[Dict[str, str]] = []
        with open(jsonl_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        rng = np.random.default_rng(seed)
        rng.shuffle(rows)
        if shard:
            import jax

            rows = rows[jax.process_index()::jax.process_count()]
        self.rows = rows

    def __len__(self) -> int:
        return len(self.rows)

    def load(self, index: int) -> Optional[Dict[str, np.ndarray]]:
        """Decode one sample; None on any failure (filtered like the ref)."""
        try:
            row = self.rows[index]
            sr = self.cfg.data.sampling_rate
            wav = read_wav(row["path"], sr)
            if wav is None or not (self.min_secs < len(wav) / sr < self.max_secs):
                return None
            text = self.tokenizer.encode(to_pinyin(row["text"]))
            if not text:
                return None

            import jax

            cpu = jax.local_devices(backend="cpu")[0]
            hop = self.cfg.data.hop_length
            # frame-grid zero-pad bounds host-compile count (trailing frames
            # beyond the true length are trimmed right below)
            n_true = len(wav) // hop // 4 * 4
            pad = (-len(wav)) % (hop * 128)
            with jax.default_device(cpu):
                spec = np.asarray(self.frontend.linear_spectrogram(
                    np.pad(wav, (0, pad))[None])[0])
                mel = np.asarray(self.frontend.spec_to_mel(spec[None])[0])
            spec, mel = spec[:n_true], mel[:n_true]
            wav = wav[: n_true * hop]
            return {"spec": spec, "mel": mel, "wav": wav,
                    "text": np.asarray(text, np.int32)}
        except Exception:
            return None


def _crop(sample: Dict[str, np.ndarray], buckets: BucketSpec,
          rng: np.random.Generator, hop: int) -> Dict[str, np.ndarray]:
    """Random 496-frame crop with raw copies kept (dataset_24k.py:152-171)."""
    spec, mel, wav = sample["spec"], sample["mel"], sample["wav"]
    out = {"raw_spec": spec, "raw_mel": mel, "raw_wav": wav,
           "text": sample["text"]}
    if spec.shape[0] > buckets.crop_threshold:
        start = int(rng.integers(0, spec.shape[0] - buckets.crop_threshold + 1))
        end = start + buckets.crop_frames
        spec = spec[start:end]
        mel = mel[start:end]
        wav = wav[start * hop : end * hop]
    out.update({"spec": spec, "mel": mel, "wav": wav})
    return out


def collate(samples: List[Dict[str, np.ndarray]], buckets: BucketSpec,
            hop: int, spec_channels: int, mel_channels: int
            ) -> Dict[str, np.ndarray]:
    """Pad to bucketed shapes; 12-key contract (dataset_24k.py:258-272).

    Sorted descending by raw length (reference sorts by raw_spec length).
    """
    samples = sorted(samples, key=lambda s: -s["raw_spec"].shape[0])
    b = len(samples)
    # uncropped samples may be up to crop_threshold frames (ref crops only
    # when > 500 but crops TO 496, dataset_24k.py:162)
    thr4 = -(-buckets.crop_threshold // 4) * 4
    t_crop = buckets.bucket(max(s["spec"].shape[0] for s in samples),
                            (buckets.crop_frames, thr4))
    t_raw = buckets.bucket(max(s["raw_spec"].shape[0] for s in samples),
                           buckets.raw_buckets)
    t_text = buckets.bucket(max(len(s["text"]) for s in samples) + 1,
                            buckets.text_buckets)

    out = {
        "spec": np.zeros((b, t_crop, spec_channels), np.float32),
        "mel": np.zeros((b, t_crop, mel_channels), np.float32),
        "wav": np.zeros((b, t_crop * hop, 1), np.float32),
        "raw_spec": np.zeros((b, t_raw, spec_channels), np.float32),
        "raw_mel": np.zeros((b, t_raw, mel_channels), np.float32),
        "raw_wav": np.zeros((b, t_raw * hop, 1), np.float32),
        "text": np.zeros((b, t_text), np.int32),
        "spec_length": np.zeros((b,), np.int32),
        "raw_spec_length": np.zeros((b,), np.int32),
        "wav_length": np.zeros((b,), np.int32),
        "raw_wav_length": np.zeros((b,), np.int32),
        "text_length": np.zeros((b,), np.int32),
    }
    for i, s in enumerate(samples):
        ts, tr, tt = s["spec"].shape[0], s["raw_spec"].shape[0], len(s["text"])
        out["spec"][i, :ts] = s["spec"]
        out["mel"][i, :ts] = s["mel"]
        out["wav"][i, : ts * hop, 0] = s["wav"][: ts * hop]
        out["raw_spec"][i, :tr] = s["raw_spec"]
        out["raw_mel"][i, :tr] = s["raw_mel"]
        out["raw_wav"][i, : tr * hop, 0] = s["raw_wav"][: tr * hop]
        out["text"][i, :tt] = s["text"]
        out["spec_length"][i] = ts
        out["raw_spec_length"][i] = tr
        out["wav_length"][i] = ts * hop
        out["raw_wav_length"][i] = tr * hop
        out["text_length"][i] = tt
    return out


class DataIterator:
    """Infinite shuffled iterator with background decode threads.

    Yields batch dicts shaped (accum, micro, ...) ready for the train step's
    grad-accumulation scan.
    """

    def __init__(self, dataset: JsonlTtsDataset, micro_batch: int,
                 accum: int = 1, buckets: BucketSpec = BucketSpec(),
                 num_threads: int = 8, prefetch: int = 4, seed: int = 0):
        self.ds = dataset
        self.micro = micro_batch
        self.accum = accum
        self.buckets = buckets
        self.rng = np.random.default_rng(seed)
        self.hop = dataset.cfg.data.hop_length
        self.spec_ch = dataset.cfg.data.spec_channels
        self.mel_ch = dataset.cfg.data.n_mel_channels
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(i,), daemon=True)
            for i in range(num_threads)
        ]
        self._index_lock = threading.Lock()
        self._perm = self.rng.permutation(len(dataset))
        self._cursor = 0
        for t in self._threads:
            t.start()

    def _next_index(self) -> int:
        with self._index_lock:
            if self._cursor >= len(self._perm):
                self._perm = self.rng.permutation(len(self.ds))
                self._cursor = 0
            i = int(self._perm[self._cursor])
            self._cursor += 1
            return i

    def _worker(self, wid: int) -> None:
        rng = np.random.default_rng(hash((wid, 1234)) % (2 ** 31))
        need = self.micro * self.accum
        while not self._stop.is_set():
            items: List[Dict[str, np.ndarray]] = []
            while len(items) < need:
                s = self.ds.load(self._next_index())
                if s is not None:
                    items.append(_crop(s, self.buckets, rng, self.hop))
            batch = collate(items, self.buckets, self.hop, self.spec_ch,
                            self.mel_ch)
            batch = {k: v.reshape((self.accum, self.micro) + v.shape[1:])
                     for k, v in batch.items()}
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return self._q.get()

    def close(self) -> None:
        self._stop.set()
