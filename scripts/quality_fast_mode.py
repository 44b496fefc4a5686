"""Quantify the fast serving mode's quality budget vs the reference default.

Fixed codes + fixed noise seed, full model size: run the SAME GPT latents
through each candidate diffusion sampler config and report the mel-domain
delta vs the reference's live path (50-step ancestral CFG,
model_24k.py:489,558-583), plus the vocoded wav delta.

Caveat (VERDICT r04 #1): the trained HF checkpoint is not fetchable in this
environment, so deltas are measured on random weights — they quantify
sampler/step-count TRAJECTORY disagreement through the real network, not
perceptual quality on trained weights.  The mel scale reference (L1 of the
baseline mel vs its mean) is printed so deltas can be read as relative.

Usage: python scripts/quality_fast_mode.py          (axon TPU)
       python scripts/quality_fast_mode.py --small  (CPU smoke)
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    if args.small:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.serving.pipeline import (EngineConfig, TTSEngine,
                                                 fast_random_variables)

    cfg = small_test_config() if args.small else Config()
    batch = 2 if args.small else args.batch
    gen_codes = 16 if args.small else 400
    prompt_secs = 3.0
    base_ecfg = EngineConfig(
        max_generate_length=gen_codes,
        text_buckets=(64,),
        prompt_buckets=(int(prompt_secs * cfg.data.sampling_rate
                            / cfg.data.hop_length) // 4 * 4,),
        code_buckets=(gen_codes,),
    )
    variables = fast_random_variables(cfg, seed=0)

    modes = [
        ("ancestral@50 (reference live path)", "ancestral", None),
        ("dpmpp_2m@25 (fast mode)", "dpmpp_2m", 25),
        ("dpmpp_2m@50", "dpmpp_2m", 50),
        ("ancestral@25", "ancestral", 25),
    ]
    if args.small:
        modes = [(n, s, min(st, 5) if st else None) for n, s, st in modes]

    rng = np.random.default_rng(0)
    sr = cfg.data.sampling_rate
    wavs = [rng.uniform(-0.3, 0.3, int(prompt_secs * sr)).astype(np.float32)
            for _ in range(batch)]
    texts = ["ni3 hao3 shi4 jie4 , zhe4 shi4 yi2 ge4 ce4 shi4 ."] * batch

    # Shared deterministic front half: one engine produces codes + latents +
    # diff_cond; every sampler mode then diffuses the SAME latents with the
    # SAME noise key (engines share weights, so only _diffuse differs).
    import jax.random as jr

    ref_eng = TTSEngine(cfg, variables, base_ecfg)
    g_rng, d_rng, v_rng = jr.split(jr.PRNGKey(0), 3)
    text, _ = ref_eng.prepare_text(texts)
    refer_mel, refer_len = ref_eng.prepare_prompt(wavs)
    t0 = time.perf_counter()
    codes, eff = ref_eng.generate_codes(refer_mel, refer_len, text, g_rng,
                                        force_full=True)
    codes_b, wav_len, bucket = ref_eng._pad_codes(codes, eff)
    latents = ref_eng._latents(ref_eng.variables, refer_mel, refer_len, text,
                               codes_b, wav_len)
    diff_cond = ref_eng.diffusion_cond(refer_mel, refer_len)
    jax.device_get(latents.ravel()[0])
    log(f"front half (codes+latents+cond): {time.perf_counter() - t0:.1f}s")

    mel_lengths = jnp.asarray(eff * FRAMES_PER_CODE, jnp.int32)
    results = []
    for name, sampler, steps in modes:
        ecfg = dataclasses.replace(base_ecfg, diffusion_sampler=sampler,
                                   diffusion_steps=steps)
        eng = TTSEngine(cfg, variables, ecfg)
        biases = eng.attention_biases(bucket * FRAMES_PER_CODE)
        t0 = time.perf_counter()
        mel = eng._diffuse(eng.variables, latents, diff_cond, biases, d_rng)
        jax.device_get(mel.ravel()[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        mel = eng._diffuse(eng.variables, latents, diff_cond, biases, d_rng)
        jax.device_get(mel.ravel()[0])
        diffuse_s = time.perf_counter() - t0
        wav = np.asarray(eng._vocode(eng.variables, mel, mel_lengths,
                                     v_rng)[..., 0], np.float32)
        results.append((name, np.asarray(mel, np.float32), wav, diffuse_s))
        log(f"{name}: diffuse {diffuse_s:.2f}s (first incl. compile "
            f"{compile_s:.1f}s)")

    base_name, base_mel, base_wav, base_s = results[0]
    mel_scale = float(np.abs(base_mel - base_mel.mean()).mean())
    print(f"# mel-L1 deltas vs {base_name}; batch={batch} codes={gen_codes} "
          f"(random weights — trajectory disagreement, see module docstring)")
    print(f"# baseline mel spread (L1 vs mean): {mel_scale:.3f}")
    for name, mel, wav, diffuse_s in results:
        d_mel = float(np.abs(mel - base_mel).mean())
        d_wav = float(np.abs(wav - base_wav).mean())
        wav_scale = float(np.abs(base_wav).mean()) or 1.0
        print(f"{name:38s} diffuse={diffuse_s:6.2f}s "
              f"mel-L1={d_mel:7.4f} ({100 * d_mel / mel_scale:5.1f}% of "
              f"spread) wav-L1={d_wav:.4f} ({100 * d_wav / wav_scale:5.1f}%)")


if __name__ == "__main__":
    main()
