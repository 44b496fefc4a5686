"""Zero-shot synthesis CLI — the reference api.py surface, argparse-driven.

Reference flow (api.py:21-50): pinyin -> BPE -> prompt mel ->
SynthesizerTrn.infer -> wav.  Here: ``TTSEngine.synthesize``.

Usage:
  python -m detail_tts_tpu.serving.api --text "你好世界" \
      --prompt prompt.wav --out gen.wav \
      [--config config.json] [--ckpt checkpoints/step_10000] \
      [--vq-only] [--seed 0]

Without ``--ckpt`` the engine runs with random weights (smoke mode).
Checkpoints are Orbax directories written by the trainer, or a pytree
msgpack from the torch-checkpoint converter.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def load_wav(path: str, target_sr: int) -> np.ndarray:
    from scipy.io import wavfile
    import scipy.signal as sps

    sr, wav = wavfile.read(path)
    wav = np.asarray(wav, np.float32)
    if wav.dtype != np.float32 or wav.max() > 2.0:
        wav = wav / 32768.0
    if wav.ndim > 1:
        wav = wav[:, 0]
    if sr != target_sr:
        wav = sps.resample_poly(wav, target_sr, sr).astype(np.float32)
    return wav


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    from scipy.io import wavfile

    if wav.dtype == np.int16:  # engine pcm16_output mode
        wavfile.write(path, sr, wav)
        return
    pcm = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sr, (pcm * 32767.0).astype(np.int16))


def build_engine(config: str | None, ckpt: str | None, seed: int = 0):
    import jax

    from detail_tts_tpu.config import Config
    from detail_tts_tpu.serving.pipeline import TTSEngine, random_engine

    cfg = Config.from_json(config) if config else Config()
    if ckpt is None:
        print("WARNING: no --ckpt given; synthesizing with random weights",
              file=sys.stderr)
        return random_engine(cfg, seed=seed)
    from detail_tts_tpu.train.checkpoint import restore_variables

    variables = restore_variables(ckpt, cfg)
    return TTSEngine(cfg, variables)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text", required=True)
    p.add_argument("--prompt", required=True, help="prompt/reference wav path")
    p.add_argument("--out", default="gen.wav")
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--vq-only", action="store_true",
                   help="diffusion-free path (reference infer_gpt)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    eng = build_engine(args.config, args.ckpt, args.seed)
    sr = eng.cfg.data.sampling_rate
    prompt = load_wav(args.prompt, sr)
    rng = jax.random.PRNGKey(args.seed)
    if args.vq_only:
        wav = eng.synthesize_vq_batch([args.text], [prompt], rng=rng)[0]
    else:
        wav = eng.synthesize(args.text, prompt, rng=rng)
    save_wav(args.out, wav, sr)
    print(f"wrote {args.out}: {len(wav) / sr:.2f}s @ {sr} Hz")


if __name__ == "__main__":
    main()
