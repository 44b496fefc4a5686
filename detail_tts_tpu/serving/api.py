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


def build_engine(config: str | None, ckpt: str | None, seed: int = 0,
                 engine_cfg=None):
    import jax

    from detail_tts_tpu.config import Config
    from detail_tts_tpu.serving.pipeline import (EngineConfig, TTSEngine,
                                                 random_engine)

    cfg = Config.from_json(config) if config else Config()
    engine_cfg = engine_cfg or EngineConfig()
    if ckpt is None:
        print("WARNING: no --ckpt given; synthesizing with random weights",
              file=sys.stderr)
        return random_engine(cfg, seed=seed, engine_cfg=engine_cfg)
    from detail_tts_tpu.train.checkpoint import restore_variables

    variables = restore_variables(ckpt, cfg)
    return TTSEngine(cfg, variables, engine_cfg=engine_cfg)


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
    p.add_argument("--long", action="store_true",
                   help="long-form mode: sentence chunking with prompt "
                        "reuse and crossfades (serving/longform.py)")
    p.add_argument("--sampler", default="ancestral",
                   choices=["ancestral", "ddim", "dpmpp_2m"],
                   help="diffusion sampler (reference live path: ancestral)")
    p.add_argument("--diffusion-steps", type=int, default=None,
                   help="override cfg.diffusion.infer_steps (fast mode)")
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--top-p", type=float, default=None)
    args = p.parse_args(argv)

    import dataclasses

    import jax

    from detail_tts_tpu.serving.pipeline import EngineConfig

    ecfg = EngineConfig(diffusion_sampler=args.sampler,
                        diffusion_steps=args.diffusion_steps)
    if args.temperature is not None:
        ecfg = dataclasses.replace(ecfg, temperature=args.temperature)
    if args.top_p is not None:
        ecfg = dataclasses.replace(ecfg, top_p=args.top_p)

    eng = build_engine(args.config, args.ckpt, args.seed, engine_cfg=ecfg)
    sr = eng.cfg.data.sampling_rate
    prompt = load_wav(args.prompt, sr)
    rng = jax.random.PRNGKey(args.seed)
    if args.long:
        from detail_tts_tpu.serving.longform import synthesize_long

        wav = synthesize_long(eng, args.text, prompt, rng=rng,
                              vq_only=args.vq_only)
    elif args.vq_only:
        wav = eng.synthesize_vq_batch([args.text], [prompt], rng=rng)[0]
    else:
        wav = eng.synthesize(args.text, prompt, rng=rng)
    save_wav(args.out, wav, sr)
    print(f"wrote {args.out}: {len(wav) / sr:.2f}s @ {sr} Hz")


if __name__ == "__main__":
    main()
