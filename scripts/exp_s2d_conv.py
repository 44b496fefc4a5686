"""Experiment: lowering strategies for SMALL-CHANNEL 1-D convs (HiFi-GAN
tail stages run at ~5% MFU on TPU: C in {50, 25, 12} leaves 61-91% of the
128-lane MXU contraction idle).

Candidates per (C, T, k, d) vocoder stage shape:
  conv : jax.lax.conv_general_dilated (current path below the tap cutoff)
  taps : k shifted (B*T, C) @ (C, O) dots (the >=64ch serving path)
  s2d  : space-to-depth packing — fold S consecutive time steps into the
         contraction so each MXU pass contracts S*C lanes:
           X[b, j, s*C+c] = xp[b, j*S+s, c]
           y packed as Y[b, j, s*O+o] = sum_m X[b, j+m] @ W_m
         with W_m[(s'*C+c), (s*O+o)] = w[i, c, o] at i = (m*S + s' - s)/d
         (static gather from w, built at trace time).

Run on the axon TPU: python scripts/exp_s2d_conv.py
(whole jitted programs, fori_loop x ITERS to swamp the ~4 ms dispatch floor;
sync via device_get per the bench recipe).

MEASURED (v5e, 2026-08-19, C=50 rows; stopped early — see exp_s2d_mrf.py
for the decisive stage-level NEGATIVE result): xla conv is flat
~2.1-2.3 ms across k (layout-traffic floor for an ISOLATED conv);
s2d loses 2.5-4x — the (B,T,C) -> (B,T/S,S*C) reshape is a real lane
relayout on TPU (C pads to 128 physical lanes), re-paid per conv.
Single-conv timings also overstate the in-network cost ~10x: inside the
fused MRF chain XLA runs these convs at ~0.2 ms each.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def make_wm_index(S, C, O, k, d, m):
    """Static index map i(m, s', s) into w (k, C, O); -1 -> zero row."""
    idx = np.full((S, S), -1, np.int64)
    for sp in range(S):
        for s in range(S):
            num = m * S + sp - s
            if num % d == 0:
                i = num // d
                if 0 <= i < k:
                    idx[sp, s] = i
    return idx


def s2d_conv(x, w, S, d):
    """x (B, T, C), w (k, C, O) -> (B, T, O); stride 1, 'same'-style torch
    padding p = (k-1)*d//2 assumed symmetric (vocoder convs use this)."""
    B, T, C = x.shape
    k, _, O = w.shape
    p = (k - 1) * d // 2
    span = (k - 1) * d
    Mmax = (S - 1 + span) // S
    Tp = ((T + S - 1) // S) * S
    # left pad p; right pad to cover the last block's reach
    xp = jnp.pad(x, ((0, 0), (p, Tp - T + (Mmax + 1) * S - p - S), (0, 0)))
    J = Tp // S
    X = xp.reshape(B, -1, S * C)  # (B, J + Mmax, S*C)
    wz = jnp.concatenate([w, jnp.zeros((1,) + w.shape[1:], w.dtype)], 0)
    y = None
    for m in range(Mmax + 1):
        idx = make_wm_index(S, C, O, k, d, m)
        # W_m: (S*C, S*O) from w via static gather
        Wm = wz[idx]                      # (S, S, C, O)
        Wm = Wm.transpose(0, 2, 1, 3).reshape(S * C, S * O)
        t = jnp.einsum("bjc,co->bjo", jax.lax.dynamic_slice_in_dim(X, m, J, 1),
                       Wm, preferred_element_type=jnp.float32)
        y = t if y is None else y + t
    return y.reshape(B, Tp, O)[:, :T].astype(x.dtype)


def tap_conv(x, w, d):
    B, T, C = x.shape
    k, _, O = w.shape
    p = (k - 1) * d // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    y = None
    for i in range(k):
        tap = jax.lax.slice_in_dim(xp, i * d, i * d + T, axis=1)
        t = jnp.dot(tap, w[i], preferred_element_type=jnp.float32)
        y = t if y is None else y + t
    return y.astype(x.dtype)


def xla_conv(x, w, d):
    k = w.shape[0]
    p = (k - 1) * d // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(p, p)], rhs_dilation=(d,),
        dimension_numbers=dn)


def timed(fn, x, w):
    def body(_, acc):
        return acc + fn(x + acc[0, 0, 0] * 0, w)
    prog = jax.jit(lambda xx, ww: jax.lax.fori_loop(
        0, ITERS, body, jnp.zeros_like(fn(xx, ww))))
    out = prog(x, w)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    out = prog(x, w)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    B = 8
    rng = np.random.default_rng(0)
    # (C, T) per vocoder tail stage at 400 codes -> 1600 frames
    stages = [(50, 102400), (25, 204800), (12, 409600)]
    for C, T in stages:
        O = C
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        for k in (3, 7, 11):
            for d in (1, 3, 5):
                w = jnp.asarray(rng.standard_normal((k, C, O)) * 0.1,
                                jnp.bfloat16)
                S = max(1, 128 // C) * 2  # pack to >=256 lanes
                res = {}
                res["conv"] = timed(functools.partial(xla_conv, d=d), x, w)
                res["taps"] = timed(functools.partial(tap_conv, d=d), x, w)
                res["s2d"] = timed(functools.partial(s2d_conv, S=S, d=d), x, w)
                # correctness vs conv (jitted — eager ops hang on axon)
                ref = np.asarray(jax.jit(
                    lambda a, b: xla_conv(a.astype(jnp.float32),
                                          b.astype(jnp.float32), d))(x, w))
                got = np.asarray(jax.jit(
                    lambda a, b: s2d_conv(a, b, S, d)
                    .astype(jnp.float32))(x, w))
                err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
                print(f"C={C:3d} T={T:6d} k={k:2d} d={d} S={S:2d} | "
                      + " ".join(f"{n}={v*1e3:7.3f}ms" for n, v in res.items())
                      + f" | s2d_rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
