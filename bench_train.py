"""Training-throughput benchmark: jitted train-step steps/sec.

Prints ONE JSON line per target to stdout:
  {"metric": "train_steps_per_sec_<target>", "value": N, "unit": "steps_per_sec"}

Measures the full jitted step (grad-accum scan for single-loss targets,
two-phase GAN step otherwise) at the reference's shipped batch/accum sizes
(config_24k.json:16-17) on synthetic device-resident batches — data loading
is benchmarked separately (tests/test_native.py covers the C++ WAV path).

Env knobs: BENCH_SMALL=1 (tiny sizes on CPU), BENCH_TARGET (default 'gpt'),
BENCH_TRAIN_STEPS (timed steps, default 5), BENCH_BATCH, BENCH_ACCUM.
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

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.train.step import (GAN_TARGETS, dummy_batch,
                                           make_train_state, make_train_step,
                                           stack_microbatches)
    import dataclasses

    target = os.environ.get("BENCH_TARGET", "gpt")
    # 10 timed steps: the shared axon chip shows occasional multi-x wall
    # spread on short windows (a 5-step gpt window has measured anywhere
    # between 2.8 and 4.1 steps/s with IDENTICAL 238 ms device time in the
    # trace) — a longer window plus the trace is the trustworthy signal.
    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", "10"))
    cfg = small_test_config() if small else Config()
    batch_size = int(os.environ.get("BENCH_BATCH",
                                    "2" if small else str(cfg.train.batch_size)))
    accum = int(os.environ.get(
        "BENCH_ACCUM", "2" if small else
        str(cfg.train.gradient_accumulate_every)))
    if target in GAN_TARGETS:
        accum = 1
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    use_bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    weight_norm = os.environ.get("BENCH_WN", "1") == "1"
    # BENCH_DROPOUT=0 removes the in-graph RNG entirely (upper bound on any
    # dropout-RNG optimization); BENCH_RNG=rbg|threefry A/Bs the step key's
    # PRNG impl (TrainConfig.rng_impl is the shipped knob).
    rng_impl = os.environ.get("BENCH_RNG")
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, target=target, batch_size=batch_size,
        gradient_accumulate_every=accum, remat_gpt=remat,
        use_bf16=use_bf16, weight_norm=weight_norm,
        **({"rng_impl": rng_impl} if rng_impl else {})))
    if "BENCH_DROPOUT" in os.environ:
        p = float(os.environ["BENCH_DROPOUT"])
        cfg = dataclasses.replace(
            cfg, gpt=dataclasses.replace(cfg.gpt, dropout=p),
            vaegan=dataclasses.replace(cfg.vaegan, p_dropout=p))

    log(f"bench_train: target={target} batch={batch_size} accum={accum} "
        f"bf16={use_bf16} wn={weight_norm} "
        f"platform={jax.devices()[0].platform}")

    t0 = time.perf_counter()
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)
    log(f"bench_train: init {time.perf_counter() - t0:.1f}s")

    mel_frames = 48 if small else 496  # the training crop (dataset_24k.py:162)
    text_len = 8 if small else 64
    batch = dummy_batch(cfg, batch_size=accum * batch_size,
                        mel_frames=mel_frames, text_len=text_len)
    key = jax.random.PRNGKey(1)
    batch["mel"] = jax.random.normal(key, batch["mel"].shape) * 2.0 - 6.0
    batch["raw_mel"] = batch["mel"]
    if target in GAN_TARGETS:
        batch["spec"] = jnp.abs(jax.random.normal(key, batch["spec"].shape))
        batch["raw_spec"] = batch["spec"]
    else:
        batch = stack_microbatches(batch, accum)

    rng = jax.random.key(2, impl=cfg.train.rng_impl)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    jax.device_get(metrics["loss" if "loss" in metrics else "loss_gen_all"])
    log(f"bench_train: compile+first step {time.perf_counter() - t0:.1f}s")

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        state, metrics = step(state, batch, jax.random.fold_in(rng, 999))
        jax.device_get(metrics["loss" if "loss" in metrics else "loss_gen_all"])
        jax.profiler.stop_trace()
        log(f"bench_train: profiler trace written to {trace_dir}")

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    # sync on a metric scalar (block_until_ready may return early over axon)
    loss = float(jax.device_get(
        metrics["loss" if "loss" in metrics else "loss_gen_all"]))
    wall = time.perf_counter() - t0
    sps = n_steps / wall
    log(f"bench_train: {n_steps} steps in {wall:.2f}s loss={loss:.4f}")
    print(json.dumps({
        "metric": f"train_steps_per_sec_{target}",
        "value": round(sps, 4),
        "unit": "steps_per_sec",
    }))


if __name__ == "__main__":
    main()
