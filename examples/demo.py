"""End-to-end demo — the reference demo.ipynb flow as a script.

Synthesizes a short Chinese sentence from a voice prompt:
  1. load config + weights (converted reference checkpoint, trained Orbax
     checkpoint, or random weights for a smoke run);
  2. zero-shot synthesis through the full pipeline
     (AR codes -> GPT latents -> 50-step CFG diffusion -> flow-VAE/HiFi-GAN);
  3. the diffusion-free VQ path for comparison;
  4. long-form synthesis via sentence chunking.

Run:  python examples/demo.py --prompt speaker.wav [--ckpt ...] [--cpu]
      python examples/demo.py --prompt speaker.wav --small --cpu  # smoke
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
    p.add_argument("--small", action="store_true",
                   help="small_test_config() model — the whole demo runs "
                        "in ~a minute on CPU (random weights)")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--text", default=None)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from detail_tts_tpu.serving.api import build_engine, load_wav, save_wav
    from detail_tts_tpu.serving.longform import synthesize_long

    text = args.text or ("你好。" if args.small
                         else "大家好，这是一个端到端的语音合成演示。")
    if args.small:
        from detail_tts_tpu.config import small_test_config
        from detail_tts_tpu.serving.pipeline import (EngineConfig,
                                                     random_engine)

        ecfg = EngineConfig(max_generate_length=8, text_buckets=(16,),
                            prompt_buckets=(32,), code_buckets=(8,))
        eng = random_engine(small_test_config(), engine_cfg=ecfg)
    else:
        eng = build_engine(None, args.ckpt)
    sr = eng.cfg.data.sampling_rate
    prompt = load_wav(args.prompt, sr)

    def out(name):
        return os.path.join(args.out_dir, name)

    wav = eng.synthesize(text, prompt, rng=jax.random.PRNGKey(0))
    save_wav(out("demo_full.wav"), wav, sr)
    print(f"demo_full.wav: {len(wav) / sr:.2f}s (diffusion path)")

    wav_vq = eng.synthesize_vq_batch([text], [prompt],
                                     rng=jax.random.PRNGKey(0))[0]
    save_wav(out("demo_vq.wav"), wav_vq, sr)
    print(f"demo_vq.wav: {len(wav_vq) / sr:.2f}s (diffusion-free path)")

    long_text = text * 3
    wav_long = synthesize_long(eng, long_text, prompt,
                               rng=jax.random.PRNGKey(1),
                               max_chars=4 if args.small else 120)
    save_wav(out("demo_long.wav"), wav_long, sr)
    print(f"demo_long.wav: {len(wav_long) / sr:.2f}s (long-form chunked)")


if __name__ == "__main__":
    main()
