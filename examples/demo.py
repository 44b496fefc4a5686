"""End-to-end demo — the reference demo.ipynb flow as a script.

Synthesizes a short Chinese sentence from a voice prompt:
  1. load config + weights (converted reference checkpoint, trained Orbax
     checkpoint, or random weights for a smoke run);
  2. zero-shot synthesis through the full pipeline
     (AR codes -> GPT latents -> 50-step CFG diffusion -> flow-VAE/HiFi-GAN);
  3. the diffusion-free VQ path for comparison;
  4. long-form synthesis via sentence chunking.

Run:  python examples/demo.py --prompt speaker.wav [--ckpt ...] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--text", default="大家好，这是一个端到端的语音合成演示。")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from detail_tts_tpu.config import Config
    from detail_tts_tpu.serving.api import build_engine, load_wav, save_wav
    from detail_tts_tpu.serving.longform import synthesize_long

    eng = build_engine(None, args.ckpt)
    sr = eng.cfg.data.sampling_rate
    prompt = load_wav(args.prompt, sr)

    wav = eng.synthesize(args.text, prompt, rng=jax.random.PRNGKey(0))
    save_wav("demo_full.wav", wav, sr)
    print(f"demo_full.wav: {len(wav) / sr:.2f}s (diffusion path)")

    wav_vq = eng.synthesize_vq_batch([args.text], [prompt],
                                     rng=jax.random.PRNGKey(0))[0]
    save_wav("demo_vq.wav", wav_vq, sr)
    print(f"demo_vq.wav: {len(wav_vq) / sr:.2f}s (diffusion-free path)")

    long_text = args.text * 3
    wav_long = synthesize_long(eng, long_text, prompt,
                               rng=jax.random.PRNGKey(1))
    save_wav("demo_long.wav", wav_long, sr)
    print(f"demo_long.wav: {len(wav_long) / sr:.2f}s (long-form chunked)")


if __name__ == "__main__":
    main()
