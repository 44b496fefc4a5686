"""A/B: exp vs exp2 softmax inside the packed row-block attention kernel.

Times N back-to-back kernel calls under one jit (amortizes the ~4 ms axon
dispatch floor) at the serving shape: 2B=16, H=16, T=1600, D=128.
Run: python scripts/ab_attention_exp2.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from detail_tts_tpu.ops.pallas.attention import (_round_up, pad_bias,  # noqa: E402
                                                 pick_block_q)

LANE = 128
LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale, mode):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    bias = bias_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    if mode == "exp":
        p = jnp.exp(logits - m)
    elif mode == "exp2":
        p = jnp.exp2((logits - m) * LOG2E)
    elif mode == "exp2_prescaled":
        # logits already in log2 domain (scale folded upstream)
        p = jnp.exp2(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (out * (1.0 / l)).astype(o_ref.dtype)


def build(mode, b, h, t, block_q, dtype=jnp.bfloat16):
    d = LANE
    n_q = t // block_q

    def call(qkv, bias):
        return pl.pallas_call(
            functools.partial(_kernel, sm_scale=1.0 / (48 ** 0.5), mode=mode),
            out_shape=jax.ShapeDtypeStruct((b, t, h * d), dtype),
            grid=(h, n_q, b),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda hh, iq, bb: (bb, iq, 3 * hh)),
                pl.BlockSpec((1, t, d), lambda hh, iq, bb: (bb, 0, 3 * hh + 1)),
                pl.BlockSpec((1, t, d), lambda hh, iq, bb: (bb, 0, 3 * hh + 2)),
                pl.BlockSpec((1, block_q, t), lambda hh, iq, bb: (hh, iq, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda hh, iq, bb: (bb, iq, hh)),
        )(qkv, qkv, qkv, bias)

    @jax.jit
    def run(qkv, bias, n=10):
        def body(i, acc):
            return acc + call(qkv, bias)[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    return run


def main():
    b, h, t = 16, 16, 1600
    block_q = pick_block_q(t)
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (b, t, h * 3 * LANE), jnp.bfloat16)
    bias = jax.random.normal(rng, (h, t, t), jnp.bfloat16) * 0.1
    print(f"shape B={b} H={h} T={t} block_q={block_q} "
          f"platform={jax.devices()[0].platform}")
    for mode in ("exp", "exp2", "exp2_prescaled", "exp"):
        run = build(mode, b, h, t, block_q)
        r = run(qkv, bias)  # compile
        jax.device_get(r)
        t0 = time.perf_counter()
        r = run(qkv, bias)
        jax.device_get(r)
        dt = time.perf_counter() - t0
        print(f"{mode:16s}: {dt / 10 * 1000:7.2f} ms/call "
              f"({b * h * t * t / (dt / 10) / 1e12:.2f} Texp/s)")


if __name__ == "__main__":
    main()
