"""Headline benchmark: end-to-end zero-shot synthesis RTF per chip, batch 8.

Prints ONE JSON line to stdout:
  {"metric": "synthesis_rtf_batch8", "value": N, "unit": "x_realtime",
   "vs_baseline": N / 20.0}

Baseline: the reference publishes no numbers (BASELINE.md); the driver-set
target is >=20x real time per TPU v5e chip at batch 8.  The measured pipeline
is the full reference `infer` path (AR codes -> GPT latents -> 50-step CFG
diffusion -> flow-VAE/HiFi-GAN vocoder) with fixed-length decoding so every
run does identical work.

Env knobs: BENCH_SMALL=1 (tiny CPU-friendly sizes), BENCH_BATCH, BENCH_CODES.
Flags: --stages (per-stage wall breakdown with forced device sync, to
stderr), BENCH_TRACE=<dir> (jax.profiler trace of one timed run).
"""
from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    if small:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    # persistent compilation cache: repeat runs skip the ~5 min warmup
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import numpy as np

    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    platform = jax.devices()[0].platform
    log(f"bench: platform={platform} devices={len(jax.devices())}")

    batch = int(os.environ.get("BENCH_BATCH", "2" if small else "8"))
    gen_codes = int(os.environ.get("BENCH_CODES", "16" if small else "400"))
    # Fast mode (documented in README serving table): BENCH_SAMPLER=dpmpp_2m
    # BENCH_STEPS=25 runs the reference's *configured* sampler at half the
    # steps; default is the reference's LIVE path (50-step ancestral CFG,
    # model_24k.py:489,558-583).
    sampler = os.environ.get("BENCH_SAMPLER", "ancestral")
    steps = os.environ.get("BENCH_STEPS")
    prompt_secs = 3.0

    cfg = small_test_config() if small else Config()
    ecfg = EngineConfig(
        max_generate_length=gen_codes,
        text_buckets=(64,),
        prompt_buckets=(int(prompt_secs * cfg.data.sampling_rate
                            / cfg.data.hop_length) // 4 * 4,),
        code_buckets=(gen_codes,),
        pcm16_output=True,  # serving wire format; halves D2H transfer
        diffusion_sampler=sampler,
        diffusion_steps=int(steps) if steps else None,
    )

    t0 = time.perf_counter()
    eng = random_engine(cfg, engine_cfg=ecfg, fast=True)
    log(f"bench: init {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    sr = cfg.data.sampling_rate
    wavs = [rng.uniform(-0.3, 0.3, int(prompt_secs * sr)).astype(np.float32)
            for _ in range(batch)]
    texts = ["ni3 hao3 shi4 jie4 , zhe4 shi4 yi2 ge4 ce4 shi4 ."] * batch

    import jax.random as jrandom

    def run(seed, timings=None):
        outs = eng.synthesize_batch(texts, wavs, rng=jrandom.PRNGKey(seed),
                                    force_full=True, timings=timings)
        return sum(len(w) for w in outs) / sr

    def cache_entries():
        try:
            return len([f for f in os.listdir(cache_dir) if "cache" in f])
        except OSError:
            return 0

    n_cached = cache_entries()
    t0 = time.perf_counter()
    audio_s = run(0)  # compile + first run
    n_new = cache_entries() - n_cached
    # n_new==0: every program was a persistent-cache hit and the wall below
    # is executable/weight *transport* + first execution, not XLA compile
    # (see README "Cold start / deployment" for the measured decomposition)
    log(f"bench: warmup (compile) {time.perf_counter() - t0:.1f}s, "
        f"audio={audio_s:.1f}s, new_compile_cache_entries={n_new}")

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        run(99)
        jax.profiler.stop_trace()
        log(f"bench: profiler trace written to {trace_dir}")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        audio_s = run(i + 1)
        times.append(time.perf_counter() - t0)
        log(f"bench: run {i}: wall={times[-1]:.2f}s audio={audio_s:.1f}s "
            f"rtf={audio_s / times[-1]:.2f}")

    if "--sustained" in sys.argv:
        # Cross-batch pipelining (serving/server.py double-buffer): dispatch
        # batch i+1's full program chain before fetching batch i's wavs.
        # Sustained RTF over k back-to-back batches vs the serial loop.
        # BENCH_TRACE_SUSTAINED=<dir> traces BOTH loops in one profile so
        # device-busy per batch can be compared (scripts/parse_trace.py);
        # BENCH_SUSTAINED_ORDER=pipe_first flips loop order (shared-chip
        # drift check).
        k = int(os.environ.get("BENCH_SUSTAINED_BATCHES", "6"))
        strace = os.environ.get("BENCH_TRACE_SUSTAINED")
        if strace:
            jax.profiler.start_trace(strace)

        def serial_loop():
            t0 = time.perf_counter()
            for i in range(k):
                run(50 + i)
            return time.perf_counter() - t0

        def pipelined_loop():
            t0 = time.perf_counter()
            prev, total_audio = None, 0.0
            for i in range(k):
                h = eng.dispatch_batch(texts, wavs,
                                       rng=jrandom.PRNGKey(200 + i),
                                       force_full=True)
                if prev is not None:
                    outs = eng.finalize_batch(prev)
                    total_audio += sum(len(w) for w in outs) / sr
                prev = h
            outs = eng.finalize_batch(prev)
            total_audio += sum(len(w) for w in outs) / sr
            wall = time.perf_counter() - t0
            # the nominal k*audio_s RTF numerator is only valid while
            # force_full pins every batch to identical audio length
            assert abs(total_audio - k * audio_s) < 1e-3 * k * audio_s, (
                f"pipelined audio {total_audio:.2f}s != nominal "
                f"{k * audio_s:.2f}s")
            return wall

        if os.environ.get("BENCH_SUSTAINED_ORDER") == "pipe_first":
            pipe_wall = pipelined_loop()
            serial_wall = serial_loop()
        else:
            serial_wall = serial_loop()
            pipe_wall = pipelined_loop()
        if strace:
            jax.profiler.stop_trace()
            log(f"bench: sustained trace written to {strace}")
        log(f"bench: sustained serial   : {k} batches in {serial_wall:.2f}s "
            f"rtf={k * audio_s / serial_wall:.2f}")
        log(f"bench: sustained pipelined: {k} batches in {pipe_wall:.2f}s "
            f"rtf={k * audio_s / pipe_wall:.2f} "
            f"(delta {100 * (serial_wall / pipe_wall - 1):+.1f}%)")

    if "--stages" in sys.argv:
        # per-stage walls with forced sync (stage sums exceed the pipelined
        # end-to-end wall slightly: sync barriers serialize the stages)
        timings = {}
        t0 = time.perf_counter()
        run(3, timings=timings)
        total = time.perf_counter() - t0
        log("bench: stage breakdown (synced):")
        for k, v in timings.items():
            log(f"bench:   {k:10s} {v:6.3f}s ({100 * v / total:4.1f}%)")
        log(f"bench:   {'total':10s} {total:6.3f}s")

    wall = min(times)
    rtf = audio_s / wall
    # metric name carries non-default mode suffixes so a fast-mode or
    # batch-16 run can't be mistaken for the headline batch-8 number
    name = "synthesis_rtf_batch8" if batch == 8 else f"synthesis_rtf_batch{batch}"
    if sampler != "ancestral" or steps:
        name += f"_{sampler}{steps or ''}"
    print(json.dumps({
        "metric": name,
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
