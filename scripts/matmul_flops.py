"""Analytic MXU-FLOP accounting for a train-step microbatch (roofline aid).

Traces the per-microbatch value_and_grad of the target's loss on CPU (no
device compute — jaxpr only), walks the jaxpr, and sums exact FLOPs of every
``dot_general`` / ``conv_general_dilated`` (forward AND backward, since the
grad trace contains the transposed dots).  This is the MXU-minimum
numerator for the training roofline tables in README/CLAUDE.md: XLA's
``compiled.cost_analysis()`` can't provide it because it counts a scanned
grad-accum body once and mixes VPU flops in.

Usage: python scripts/matmul_flops.py [target=diff] [mel_frames=496]
Prints per-primitive totals and the peak-time equivalents at v5e rates.
"""
from __future__ import annotations

import dataclasses
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_FLOPS = 197e12  # per chip
V5E_HBM_BPS = 819e9


def _dot_flops(eqn) -> float:
    a, b = (v.aval for v in eqn.invars[:2])
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dnums
    batch = 1.0
    for d in lb:
        batch *= a.shape[d]
    k = 1.0
    for d in lc:
        k *= a.shape[d]
    m = 1.0
    for i, s in enumerate(a.shape):
        if i not in lc and i not in lb:
            m *= s
    n = 1.0
    for i, s in enumerate(b.shape):
        if i not in rc and i not in rb:
            n *= s
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    x, w = (v.aval for v in eqn.invars[:2])
    out = eqn.outvars[0].aval
    # flops = 2 * out_elements * (K_spatial * C_in / feature_group_count)
    k_spatial = 1.0
    dnums = eqn.params["dimension_numbers"]
    w_spec = dnums.rhs_spec  # (out_c, in_c, *spatial)
    for d in w_spec[2:]:
        k_spatial *= w.shape[d]
    c_in = w.shape[w_spec[1]]
    out_elems = 1.0
    for s in out.shape:
        out_elems *= s
    return 2.0 * out_elems * k_spatial * c_in


def walk(jaxpr, totals, scale=1.0):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            totals["dot_general"] += scale * _dot_flops(eqn)
            continue
        if prim == "conv_general_dilated":
            totals["conv"] += scale * _conv_flops(eqn)
            continue
        # a scan body executes params['length'] times; everything else
        # with a sub-jaxpr (pjit/remat/custom_vjp/cond/while) executes once
        # per outer visit (while-loop trip counts aren't static — none of
        # the training steps contain a while with matmuls inside).
        sub_scale = scale * eqn.params.get("length", 1) \
            if prim == "scan" else scale
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                walk(sub.jaxpr, totals, sub_scale)
            elif hasattr(sub, "eqns"):  # raw Jaxpr
                walk(sub, totals, sub_scale)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        walk(s.jaxpr, totals, sub_scale)
                    elif hasattr(s, "eqns"):
                        walk(s, totals, sub_scale)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from detail_tts_tpu.config import Config
    from detail_tts_tpu.train.step import (dummy_batch, make_train_state,
                                           make_train_step,
                                           stack_microbatches)

    target = sys.argv[1] if len(sys.argv) > 1 else "diff"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 496
    cfg = Config()
    accum = 1  # single micro: per-micro flops (scan body traced once)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, target=target, gradient_accumulate_every=accum))
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)
    batch = dummy_batch(cfg, batch_size=accum * cfg.train.batch_size,
                        mel_frames=frames, text_len=64)
    if target in ("gpt", "diff", "vqvae"):
        batch = stack_microbatches(batch, accum)
    rng = jax.random.key(2, impl=cfg.train.rng_impl)
    jaxpr = jax.make_jaxpr(step)(state, batch, rng)
    totals = defaultdict(float)
    walk(jaxpr.jaxpr, totals)
    total = sum(totals.values())
    print(f"target={target} micro_batch={cfg.train.batch_size} "
          f"frames={frames} (ONE microbatch, fwd+bwd+update)")
    for k, v in sorted(totals.items()):
        print(f"  {k:12s} {v/1e12:8.3f} TFLOP")
    print(f"  {'total':12s} {total/1e12:8.3f} TFLOP "
          f"-> {1e3 * total / V5E_BF16_FLOPS:6.1f} ms at v5e bf16 peak")
    # GAN targets run un-accumulated (bench_train forces accum=1 there)
    full = (Config().train.gradient_accumulate_every
            if target in ("gpt", "diff", "vqvae") else 1)
    print(f"  x{full} microbatches = {full * total/1e12:8.3f} TFLOP "
          f"-> {1e3 * full * total / V5E_BF16_FLOPS:6.1f} ms/step at peak")


if __name__ == "__main__":
    main()
