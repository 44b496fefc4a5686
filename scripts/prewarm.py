"""Pre-compile the serving programs for a production bucket set.

Populates JAX's persistent compilation cache (default: <repo>/.jax_cache,
same dir bench.py and serving use) so the first REAL request — or the next
bench.py invocation — deserializes compiled programs instead of paying the
~5 min XLA compile per bucket combo.  This is the deploy-time cold-start
recipe: run once per release artifact, per bucket set, per hardware
generation; ship the cache dir alongside the weights.

Usage:
  python scripts/prewarm.py                 # bench.py's exact bucket combo
  python scripts/prewarm.py --batch 8 16    # several batch sizes
  python scripts/prewarm.py --grid          # the full EngineConfig default
                                            # bucket grid (long!)

Weights don't affect compiled programs (only shapes/dtypes do), so random
weights (`fast_random_variables`) compile byte-identical cache entries to a
real checkpoint at the same config — no checkpoint needed to prewarm.
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--codes", type=int, default=400,
                    help="max_generate_length / code bucket (bench: 400)")
    ap.add_argument("--grid", action="store_true",
                    help="prewarm the full EngineConfig default bucket grid "
                         "instead of the single bench combo")
    ap.add_argument("--force-full", action="store_true", default=True)
    ap.add_argument("--small", action="store_true",
                    help="tiny config on CPU (smoke test of this script)")
    args = ap.parse_args()

    if args.small:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print(f"prewarm: platform={jax.devices()[0].platform} "
          f"cache={cache_dir}", file=sys.stderr, flush=True)

    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    cfg = small_test_config() if args.small else Config()
    if args.grid:
        ecfg = EngineConfig(pcm16_output=True)
    else:
        # bench.py's exact serving combo (keep in sync with bench.py main)
        prompt_secs = 3.0
        codes = 16 if args.small else args.codes
        ecfg = EngineConfig(
            max_generate_length=codes,
            text_buckets=(64,),
            prompt_buckets=(int(prompt_secs * cfg.data.sampling_rate
                                / cfg.data.hop_length) // 4 * 4,),
            code_buckets=(codes,),
            pcm16_output=True,
        )

    t0 = time.perf_counter()
    eng = random_engine(cfg, engine_cfg=ecfg, fast=True)
    print(f"prewarm: engine init {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    combos = list(itertools.product(
        args.batch if not args.small else [2],
        eng.ecfg.text_buckets, eng.ecfg.prompt_buckets,
        eng.ecfg.code_buckets))
    for n, (b, tb, pb, cb) in enumerate(combos):
        t0 = time.perf_counter()
        eng.warmup(batch_size=b, text_bucket=tb, prompt_bucket=pb,
                   code_bucket=cb, force_full=args.force_full)
        print(f"prewarm: [{n + 1}/{len(combos)}] batch={b} text={tb} "
              f"prompt={pb} codes={cb}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    print("prewarm: done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
