"""Training-throughput benchmark: jitted train-step steps/sec + device time.

Prints ONE JSON line per target to stdout:
  {"metric": "train_steps_per_sec_<target>", "value": N,
   "unit": "steps_per_sec", "device_ms_per_step": N, "wall_ms_per_step": N}

``--all`` benchmarks every trainer target the reference DDP-wraps
(train.py:132-133): gpt, diff, vqvae, flowvae, all — one JSON line each
(the driver-auditable artifact: BENCH_TRAIN_r0N.json).

Measures the full jitted step (grad-accum scan for single-loss targets,
two-phase GAN step otherwise) at the reference's shipped batch/accum sizes
(config_24k.json:16-17) on synthetic device-resident batches — data loading
is benchmarked separately (tests/test_native.py covers the C++ WAV path).
``device_ms_per_step`` is the merged device-busy time of ONE traced step
(same busy-interval math as scripts/parse_trace.py --gaps); on the shared
axon chip the WALL number drifts multi-x on short windows, the traced
device time is the trustworthy signal (CLAUDE.md training wall caveat).

Env knobs: BENCH_SMALL=1 (tiny sizes on CPU), BENCH_TARGET (default 'gpt'),
BENCH_TRAIN_STEPS (timed steps, default 10), BENCH_BATCH, BENCH_ACCUM,
BENCH_NOTRACE=1 (skip the device-time trace).
"""
from __future__ import annotations

import dataclasses
import gzip
import json
import os
import sys
import tempfile
import time

ALL_TARGETS = ("gpt", "diff", "vqvae", "flowvae", "all")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_busy_seconds(trace_dir: str) -> float:
    """Merged device-busy seconds of the newest trace under ``trace_dir``.

    Kernel events only (tf_op or source present) — envelope spans cover
    host stalls between kernels and would overstate device time; identical
    interval math to scripts/parse_trace.py print_gaps."""
    from pathlib import Path

    traces = sorted(Path(trace_dir).rglob("*.trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        return float("nan")
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    ivs = []
    for e in events:
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        proc = pid_name.get(e.get("pid"), "")
        if not ("TPU" in proc or "/device" in proc or "XLA" in proc):
            continue
        a = e.get("args", {})
        if not (a.get("tf_op") or a.get("source")):
            continue
        ivs.append((e["ts"], e["ts"] + e["dur"]))
    if not ivs:
        return float("nan")
    ivs.sort()
    busy, (cur_s, cur_e) = 0.0, ivs[0]
    for s, e_ in ivs[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e_
        elif e_ > cur_e:
            cur_e = e_
    busy += cur_e - cur_s
    return busy / 1e6


def bench_target(target: str, small: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.train.step import (GAN_TARGETS, dummy_batch,
                                           make_train_state, make_train_step,
                                           stack_microbatches)

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

    # BENCH_DONATE=1 measures the production trainer's donated-buffer step
    # (in-place param/opt updates); default 0 keeps the historical
    # comparable numbers (state reused across timed iterations either way —
    # donation only changes XLA's buffer aliasing).
    donate = os.environ.get("BENCH_DONATE", "0") == "1"
    t0 = time.perf_counter()
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=donate)
    log(f"bench_train: init {time.perf_counter() - t0:.1f}s donate={donate}")

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

    def sync(metrics):
        # sync on a metric scalar (block_until_ready may return early over axon)
        return float(jax.device_get(
            metrics["loss" if "loss" in metrics else "loss_gen_all"]))

    rng = jax.random.key(2, impl=cfg.train.rng_impl)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    sync(metrics)
    log(f"bench_train: compile+first step {time.perf_counter() - t0:.1f}s")

    device_ms = float("nan")
    if os.environ.get("BENCH_NOTRACE", "0") != "1":
        trace_dir = os.environ.get("BENCH_TRACE") or tempfile.mkdtemp(
            prefix=f"bench_train_{target}_")
        jax.profiler.start_trace(trace_dir)
        state, metrics = step(state, batch, jax.random.fold_in(rng, 999))
        sync(metrics)
        jax.profiler.stop_trace()
        device_ms = _device_busy_seconds(trace_dir) * 1e3
        log(f"bench_train: trace at {trace_dir}: device {device_ms:.1f} "
            "ms/step")

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    loss = sync(metrics)
    wall = time.perf_counter() - t0
    sps = n_steps / wall
    log(f"bench_train: {n_steps} steps in {wall:.2f}s loss={loss:.4f}")
    return {
        "metric": f"train_steps_per_sec_{target}",
        "value": round(sps, 4),
        "unit": "steps_per_sec",
        "device_ms_per_step": round(device_ms, 1),
        "wall_ms_per_step": round(1e3 * wall / n_steps, 1),
    }


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

    targets = (ALL_TARGETS if "--all" in sys.argv
               else (os.environ.get("BENCH_TARGET", "gpt"),))
    for target in targets:
        print(json.dumps(bench_target(target, small)), flush=True)


if __name__ == "__main__":
    main()
