"""Experiment 2: a FULL HiFi-GAN MRF stage (3 kernel sizes x [lrelu ->
dilated conv -> lrelu -> conv] x 3, residual adds, averaged) in two
lowerings:

  xla    : lax.conv_general_dilated per conv (current serving path)
  packed : space-to-depth once at stage entry (S*C >= 192 lanes), all 18
           convs as block-matmuls on the packed layout (exp_s2d_conv.s2d
           math, but pack/unpack hoisted out), elementwise ops run packed.

If packed wins, the vocoder tail (C in {50, 25, 12}) can run packed
end-to-end with one relayout per stage boundary.
Run on the axon TPU: python scripts/exp_s2d_mrf.py

MEASURED (v5e, 2026-08-19, B=8, bf16) — NEGATIVE, do not pursue:
  C= 50 T=102400 S= 4 | xla=3.626ms packed= 8.124ms
  C= 25 T=204800 S= 8 | xla=3.394ms packed=10.057ms
  C= 12 T=409600 S=16 | xla=5.208ms packed=14.071ms
Two findings: (1) the packed form loses 2-3x even with the relayout
hoisted out — the (Mmax+1) full re-reads of X per conv (one per packed
weight block) swamp the MXU-lane win, and XLA cannot dedupe HBM reads
across separate dots (a pallas kernel could, but see (2));
(2) the XLA baseline for a FULL fused MRF stage is only ~0.2 ms/conv —
18 convs in 3.6 ms — an order cheaper than the same conv benchmarked
alone (exp_s2d_conv.py: ~2.1 ms), because XLA fuses the
lrelu->conv->add chains and keeps tiles resident.  The whole vocoder
tail is ~12 ms/batch of a 2.85 s pipeline: no prize here.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from exp_s2d_conv import make_wm_index

KS = (3, 7, 11)
DILS = (1, 3, 5)
ITERS = 20


def lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def xla_conv(x, w, d):
    k = w.shape[0]
    p = (k - 1) * d // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(p, p)], rhs_dilation=(d,),
        dimension_numbers=dn)


def mrf_xla(x, weights):
    acc = None
    for k in KS:
        xt = x
        for j, d in enumerate(DILS):
            y = lrelu(xt)
            y = xla_conv(y, weights[(k, "c1", j)], d)
            y = lrelu(y)
            y = xla_conv(y, weights[(k, "c2", j)], 1)
            xt = xt + y
        acc = xt if acc is None else acc + xt
    return acc / len(KS)


def packed_conv(X, w, S, d, J):
    """X (B, J+Mpad, S*C) pre-padded packed input (left block 0 holds the
    left halo), returns (B, J, S*O).  'same' torch padding is baked into
    the halo layout by the caller."""
    k, C, O = w.shape
    span = (k - 1) * d
    Mmax = (S - 1 + span) // S
    wz = jnp.concatenate([w, jnp.zeros((1,) + w.shape[1:], w.dtype)], 0)
    y = None
    for m in range(Mmax + 1):
        idx = make_wm_index(S, C, O, k, d, m)
        Wm = wz[idx].transpose(0, 2, 1, 3).reshape(S * C, S * O)
        t = jnp.einsum("bjc,co->bjo",
                       jax.lax.dynamic_slice_in_dim(X, m, J, 1),
                       Wm.astype(X.dtype), preferred_element_type=jnp.float32)
        y = t if y is None else y + t
    return y.astype(X.dtype)


def mrf_packed(x, weights, S):
    """x (B, T, C) -> same as mrf_xla, via one pack + packed convs.

    Halo handling: keep one zero halo block on each side; convs with torch
    'same' padding p read [t - p, t + p] — re-express as reading packed
    blocks [j .. j + Mmax] of an input shifted so tap 0 starts at t - p.
    We maintain the invariant that activations carry HALO extra blocks on
    the left so a left-shifted view exists without relayout."""
    B, T, C = x.shape
    # worst-case left reach p <= (11-1)*5//2 = 25 -> HALO blocks
    pmax = 25
    halo = (pmax + S - 1) // S
    J = T // S
    Mpad = halo + 4  # right halo (worst Mmax at S>=4 is <= 4)
    xp = jnp.pad(x, ((0, 0), (halo * S, Mpad * S - 0), (0, 0)))
    X = xp.reshape(B, -1, S * C)  # (B, halo + J + Mpad, S*C)

    def conv_packed(Xfull, w, d):
        k = w.shape[0]
        p = (k - 1) * d // 2
        # tap 0 at t - p: start block offset = halo - ceil(p/S), with an
        # in-block shift r = (halo*S - p) % S folded into the W_m index map
        start = halo * S - p
        sb, r = divmod(start, S)
        # shift the index map by r: i((m, s', s)) with s' -> s' (input
        # position (sb + m) * S + s'), output position halo*S + j*S + s
        # => i*d = (sb + m)*S + s' - (halo*S + s) + p = m*S + s' - s + (r - 0)
        # folded by using a custom map below.
        k_, C_, O_ = w.shape
        wz = jnp.concatenate([w, jnp.zeros((1,) + w.shape[1:], w.dtype)], 0)
        span = (k - 1) * d
        Mmax = (S - 1 + r + span) // S  # all m with any valid tap
        y = None
        for m in range(Mmax + 1):
            idx = np.full((S, S), -1, np.int64)
            for sp in range(S):
                for s in range(S):
                    num = m * S + sp - s - r
                    if num % d == 0:
                        i = num // d
                        if 0 <= i < k:
                            idx[sp, s] = i
            if (idx < 0).all():
                continue
            Wm = wz[idx].transpose(0, 2, 1, 3).reshape(S * C_, S * O_)
            t = jnp.einsum("bjc,co->bjo",
                           jax.lax.dynamic_slice_in_dim(Xfull, sb + m, J, 1),
                           Wm.astype(Xfull.dtype),
                           preferred_element_type=jnp.float32)
            y = t if y is None else y + t
        return y.astype(Xfull.dtype)

    def rehalo(Ycore):
        # (B, J, S*C) -> padded (B, halo + J + Mpad, S*C)
        return jnp.pad(Ycore, ((0, 0), (halo, Mpad), (0, 0)))

    def stage(Xt):
        accs = None
        for k in KS:
            cur = Xt
            for j, d in enumerate(DILS):
                y = rehalo(lrelu(cur[:, halo:halo + J]))
                y = conv_packed(y, weights[(k, "c1", j)], d)
                y = rehalo(lrelu(y))
                y = conv_packed(y, weights[(k, "c2", j)], 1)
                cur = rehalo(cur[:, halo:halo + J] + y)
            accs = cur if accs is None else rehalo(
                accs[:, halo:halo + J] + cur[:, halo:halo + J])
        return accs[:, halo:halo + J] / len(KS)

    out = stage(X)
    return out.reshape(B, J * S, C)


def timed(fn, *args):
    prog = jax.jit(lambda *a: jax.lax.fori_loop(
        0, ITERS, lambda _, acc: acc + fn(*a) * 1e-3, jnp.zeros_like(fn(*a))))
    out = prog(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    out = prog(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    B = 8
    rng = np.random.default_rng(0)
    for C, T in [(50, 102400), (25, 204800), (12, 409600)]:
        S = {50: 4, 25: 8, 12: 16}[C]
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        weights = {}
        for k in KS:
            for tag in ("c1", "c2"):
                for j in range(3):
                    weights[(k, tag, j)] = jnp.asarray(
                        rng.standard_normal((k, C, C)) * (0.5 / np.sqrt(k * C)),
                        jnp.bfloat16)
        # correctness (jitted)
        ref = np.asarray(jax.jit(
            lambda a: mrf_xla(a, weights).astype(jnp.float32))(x))
        got = np.asarray(jax.jit(
            lambda a: mrf_packed(a, weights, S).astype(jnp.float32))(x))
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
        t_x = timed(lambda a: mrf_xla(a, weights), x)
        t_p = timed(lambda a: mrf_packed(a, weights, S), x)
        print(f"C={C:3d} T={T} S={S:2d} | xla={t_x*1e3:7.3f}ms "
              f"packed={t_p*1e3:7.3f}ms | rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
