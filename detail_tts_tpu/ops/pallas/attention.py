"""Pallas TPU attention kernel for the diffusion refiner.

The reference diffusion attention (diff_util.py:136-215) materializes the
full (B*H, T, T) logits in HBM, plus a T5 relative-position bias gathered to
(T, T, H) per call (xtransformers.py:146-186).  At serving shapes
(2B=16, H=16, T~1600, 50 steps x 13 blocks) that is ~10 TB of HBM traffic —
the dominant cost of the whole TTS pipeline.

This kernel keeps each (BQ, T) logits row-block in VMEM: one pass computes
qk^T + bias, a numerically-safe softmax, and the value contraction without
ever writing logits to HBM.  The bias is precomputed once per *sampling
call* as (H, T, T) — it is shared across the batch and across all 50
diffusion steps — and the grid is ordered (h, q_block, batch) so the bias
tile is fetched once and revisited for every batch element.

Padded key columns are masked by writing -1e9 into the padded bias columns
(host-side, in :func:`pad_bias`), so the kernel itself is mask-free.

Softmax runs in BASE 2 (``exp2``): folding log2(e) into the scale and the
(hoisted, call-invariant) bias is ~10% faster than ``exp`` on the VPU at
serving shapes (scripts/ab_attention_exp2.py: 2.96 vs 3.35 ms/call).  Pass
``bias_log2=True`` when the bias already carries the log2(e) factor (the
serving hoist does this once per sampling call); otherwise the wrapper
scales it.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
LOG2E = 1.4426950408889634  # log2(e): natural-domain logits -> exp2 domain


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_block_q(t: int) -> int:
    """Largest row-block that divides T exactly (zero softmax/pad waste,
    fewest K/V re-fetches); VMEM caps the block at 800 rows."""
    for bq in (800, 640, 512, 448, 400, 384, 320, 256, 224, 200, 192, 160,
               128):
        if t % bq == 0:
            return bq
    return 256


_CLAMP = 100.0  # log2-domain overflow guard (see _softmax_no_max note)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale: float):
    # sm_scale folds into q: a (BQ, D) multiply instead of a (BQ, T) one —
    # the softmax path is VPU-bound, every full-logits pass costs ~10%
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale
    k = k_ref[0, 0].astype(jnp.float32)       # (T, D)
    v = v_ref[0, 0]                            # (T, D)
    bias = bias_ref[0].astype(jnp.float32)     # (BQ, T)

    # sm_scale and bias arrive in the log2 domain: exp2 beats exp on the VPU
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    # NO-MAX softmax: subtracting the row max is only an overflow guard (the
    # result is algebraically identical); a clamp at 2^100 guards overflow
    # with ONE cheap op instead of a full max-reduce + broadcast-subtract
    # over the (BQ, T) logits.  fp32 underflow below max-126 maps weights to
    # 0 that normalization would have made ~0 anyway; the +1e-30 keeps a
    # fully-underflowed row at 0 instead of NaN.
    p = jnp.exp2(jnp.minimum(logits, _CLAMP))
    l = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / l).astype(o_ref.dtype)


def pad_bias(bias: jax.Array, t_real: int, t_pad: int) -> jax.Array:
    """(H, T, T) -> (H, Tp, Tp) with -1e9 in padded key columns."""
    h = bias.shape[0]
    out = jnp.full((h, t_pad, t_pad), -1e9, bias.dtype)
    return jax.lax.dynamic_update_slice(out, bias, (0, 0, 0))


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "interpret", "bias_log2"))
def row_block_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        bias: jax.Array, *, sm_scale: float,
                        block_q: int = 128,
                        interpret: bool = False,
                        bias_log2: bool = False) -> jax.Array:
    """Attention with an additive per-head bias shared over the batch.

    q, k, v: (B, H, T, D); bias: (H, T, T) (already scaled; padded key
    columns, if any, must carry -1e9).  ``sm_scale`` is the NATURAL-domain
    scale; ``bias_log2=True`` declares the bias pre-multiplied by log2(e)
    (hoisted serving path), else it is scaled here.  Returns (B, H, T, D)
    in q's dtype.

    T and D must satisfy the wrapper's padding (use :func:`attention` for
    arbitrary shapes).
    """
    b, h, t, d = q.shape
    assert t % block_q == 0 and d % LANE in (0, 64), (t, d)
    n_q = t // block_q
    sm_scale = sm_scale * LOG2E
    if not bias_log2:
        bias = bias * jnp.asarray(LOG2E, bias.dtype)

    grid = (h, n_q, b)  # batch innermost: bias tile revisited, not re-fetched
    return pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, iq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, iq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, block_q, t), lambda hh, iq, bb: (hh, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda hh, iq, bb: (bb, hh, iq, 0)),
        interpret=interpret,
    )(q, k, v, bias)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, bias: jax.Array,
              *, sm_scale: float, block_q: int = 128,
              interpret: bool = False, bias_log2: bool = False) -> jax.Array:
    """Shape-safe wrapper: pads T to a block multiple and D to 64/128.

    q, k, v: (B, H, T, D); bias: (H, T, T) pre-scaled.  Padded key columns
    are masked via the bias; padded query rows are sliced away.
    """
    b, h, t, d = q.shape
    t_pad = _round_up(t, block_q)
    d_pad = 64 if d <= 64 else _round_up(d, LANE)

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))

    bias_p = pad_bias(bias, t, t_pad) if t_pad != t else bias
    out = row_block_attention(pad_qkv(q), pad_qkv(k), pad_qkv(v), bias_p,
                              sm_scale=sm_scale, block_q=block_q,
                              interpret=interpret, bias_log2=bias_log2)
    return out[:, :, :t, :d]
# ---------------------------------------------------------------------------
# Trainable attention: custom-VJP with flash-style pallas backward kernels.
#
# Training cannot use the forward-only serving kernels (no VJP), so the
# XLA path materialized (B, H, T, T) logits in HBM for forward AND backward
# — at the diff-stage training shapes that logits traffic is the single
# biggest block of step time.  Here both directions stay in VMEM:
#   fwd: row-block kernel also emits per-row softmax sums l;
#   bwd: dq/dbias kernel over row blocks, dk/dv kernel over column blocks,
#        each recomputing its probability tile from (q, k, bias, l).
# Math (log2 domain, no-max softmax as above):
#   z = (q*c)k^T + b_log2,  s = exp2(z)/l,  out = s v
#   dz = ln2 * s * (do v^T - delta),  delta = rowsum(do*out)
#   dq = (dz k) c,  dk = dz^T (q c),  dv = s^T do,  db_log2 = sum_B dz
# ---------------------------------------------------------------------------

LN2 = 0.6931471805599453


def _attn_fwd_train_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref, *,
                           sm_scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    bias = bias_ref[0].astype(jnp.float32)
    z = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias
    p = jnp.exp2(jnp.minimum(z, _CLAMP))
    l = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    out = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / l).astype(o_ref.dtype)
    l_ref[0, 0] = l  # (BQ, 1): trailing singleton keeps the block tiling legal


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, l_ref,
                        delta_ref, dq_ref, dbias_ref, *, sm_scale: float):
    b_idx = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale       # (BQ, D), pre-scaled
    k = k_ref[0, 0].astype(jnp.float32)                   # (T, D)
    v = v_ref[0, 0].astype(jnp.float32)                   # (T, D)
    bias = bias_ref[0].astype(jnp.float32)                # (BQ, T)
    do = do_ref[0, 0].astype(jnp.float32)                 # (BQ, D)
    l = l_ref[0, 0].astype(jnp.float32)                   # (BQ, 1)
    delta = delta_ref[0, 0].astype(jnp.float32)           # (BQ, 1)

    z = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias
    s = jnp.exp2(jnp.minimum(z, _CLAMP)) / l
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dz = (LN2 * s) * (dp - delta)                         # (BQ, T)
    dq = jax.lax.dot_general(dz, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    # bias is shared over the batch; b is the innermost grid dim so the
    # output tile stays resident and accumulates across b iterations
    @pl.when(b_idx == 0)
    def _init():
        dbias_ref[0] = dz.astype(dbias_ref.dtype)

    @pl.when(b_idx > 0)
    def _acc():
        dbias_ref[0] = dbias_ref[0] + dz.astype(dbias_ref.dtype)


def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, l_ref,
                         delta_ref, dk_ref, dv_ref, *, sm_scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale        # (T, D)
    k = k_ref[0, 0].astype(jnp.float32)                   # (BK, D)
    v = v_ref[0, 0].astype(jnp.float32)                   # (BK, D)
    bias = bias_ref[0].astype(jnp.float32)                # (T, BK)
    do = do_ref[0, 0].astype(jnp.float32)                 # (T, D)
    l = l_ref[0, 0].astype(jnp.float32)                   # (T, 1)
    delta = delta_ref[0, 0].astype(jnp.float32)           # (T, 1)

    z = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) + bias
    s = jnp.exp2(jnp.minimum(z, _CLAMP)) / l              # (T, BK)
    dv = jax.lax.dot_general(s, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (T, BK)
    dz = (LN2 * s) * (dp - delta)
    dk = jax.lax.dot_general(dz, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def attention_train(q, k, v, bias, sm_scale, block_q=256, interpret=False):
    """Differentiable bias-attention; q/k/v (B,H,T,D), bias (H,T,T) natural.

    T must be a multiple of ``block_q`` and D a multiple of 64/128 — use
    :func:`attention_train_padded` for arbitrary shapes.
    """
    out, _ = _attn_train_fwd(q, k, v, bias, sm_scale, block_q, interpret)
    return out


def _attn_train_fwd(q, k, v, bias, sm_scale, block_q, interpret):
    b, h, t, d = q.shape
    assert t % block_q == 0 and d % 64 == 0, (t, d)
    c = sm_scale * LOG2E
    bias2 = bias * jnp.asarray(LOG2E, bias.dtype)
    grid = (h, t // block_q, b)
    out, l = pl.pallas_call(
        functools.partial(_attn_fwd_train_kernel, sm_scale=c),
        out_shape=(jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, iq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, iq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, block_q, t), lambda hh, iq, bb: (hh, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda hh, iq, bb: (bb, hh, iq, 0)),
        ),
        interpret=interpret,
    )(q, k, v, bias2)
    return out, (q, k, v, bias2, l, out)


def _attn_train_bwd(sm_scale, block_q, interpret, res, do):
    q, k, v, bias2, l, out = res
    b, h, t, d = q.shape
    c = sm_scale * LOG2E
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (B, H, T, 1)
    grid = (h, t // block_q, b)
    dq, dbias2 = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, sm_scale=c),
        out_shape=(jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
                   jax.ShapeDtypeStruct((h, t, t), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, iq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, iq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, block_q, t), lambda hh, iq, bb: (hh, iq, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda hh, iq, bb: (bb, hh, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hh, iq, bb: (bb, hh, iq, 0)),
            pl.BlockSpec((1, block_q, t), lambda hh, iq, bb: (hh, iq, 0)),
        ),
        interpret=interpret,
    )(q, k, v, bias2, do, l, delta)

    grid_kv = (h, t // block_q, b)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, sm_scale=c),
        out_shape=(jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t, d), q.dtype)),
        grid=grid_kv,
        in_specs=[
            pl.BlockSpec((1, 1, t, d), lambda hh, ik, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda hh, ik, bb: (bb, hh, ik, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda hh, ik, bb: (bb, hh, ik, 0)),
            pl.BlockSpec((1, t, block_q), lambda hh, ik, bb: (hh, 0, ik)),
            pl.BlockSpec((1, 1, t, d), lambda hh, ik, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, 1), lambda hh, ik, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, 1), lambda hh, ik, bb: (bb, hh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda hh, ik, bb: (bb, hh, ik, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda hh, ik, bb: (bb, hh, ik, 0)),
        ),
        interpret=interpret,
    )(q, k, v, bias2, do, l, delta)

    dbias = dbias2 * LOG2E  # chain through bias2 = bias * log2(e)
    return dq, dk, dv, dbias.astype(bias2.dtype)


attention_train.defvjp(_attn_train_fwd, _attn_train_bwd)


def attention_train_padded(q, k, v, bias, *, sm_scale: float,
                           block_q: int = 256, interpret: bool = False):
    """Shape-safe trainable attention: pads T to a block multiple and D to
    64/128; padded key columns masked via -1e9 bias, padded q rows sliced."""
    b, h, t, d = q.shape
    t_pad = _round_up(t, block_q)
    d_pad = 64 if d <= 64 else _round_up(d, LANE)

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))

    bias_p = pad_bias(bias, t, t_pad) if t_pad != t else bias
    out = attention_train(pad_qkv(q), pad_qkv(k), pad_qkv(v), bias_p,
                          sm_scale, block_q, interpret)
    return out[:, :, :t, :d]


def _attn_paired_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        sm_scale: float):
    """Two heads per grid step, packed into one 128-lane block.

    q/k/v blocks are (BQ|T, 128) with head 2p in lanes [0, 64) and head
    2p+1 in lanes [64, 128) (each real head dim <= 64, zero-padded).  A
    lane mask on q zeroes the other head's lanes before each qk^T dot, so
    one full-width MXU dot computes one head's logits exactly (the masked
    lanes contribute 0).  The value contraction runs full-width too; the
    final lane select keeps each head's own output columns.

    Versus one-head-per-128-lane packing this halves the qkv projection
    and proj_out matmuls OUTSIDE the kernel (the dominant non-attention
    cost of the diffusion trunk at head dim 48: 768->3072 instead of
    768->6144) and halves K/V HBM fetches (one K/V tile serves two
    heads); in-kernel MXU/VPU work per head is unchanged.
    """
    half = LANE // 2
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (BQ, 128): [even|odd]
    k = k_ref[0].astype(jnp.float32)             # (T, 128)
    v = v_ref[0]                                  # (T, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    is_even = lane < half

    out = None
    for parity in (0, 1):
        bias = bias_ref[parity].astype(jnp.float32)  # (BQ, T)
        q_h = jnp.where(is_even if parity == 0 else ~is_even, q, 0.0)
        logits = jax.lax.dot_general(
            q_h, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        p = jnp.exp2(jnp.minimum(logits, _CLAMP))
        l = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
        res = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l   # (BQ, 128)
        out = res if parity == 0 else jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, res.shape, 1) < half,
            out, res)
    o_ref[0] = out.astype(o_ref.dtype)


def pick_block_q_paired(t: int) -> int:
    """Paired kernel holds TWO (BQ, T) bias tiles + two logits tiles in
    VMEM — cap the row block at 400 (vs 800 for the one-head kernel)."""
    for bq in (400, 384, 320, 256, 200, 192, 160, 128):
        if t % bq == 0:
            return bq
    return 256


def attention_packed_pairs(qkv_flat: jax.Array, bias: jax.Array, *,
                           heads: int, sm_scale: float,
                           block_q: int = 256,
                           interpret: bool = False,
                           bias_log2: bool = False) -> jax.Array:
    """Layout-preserving attention with TWO heads per 128-lane block.

    qkv_flat: (B, T, (H//2) * 3 * 128) — channel order [head-pair][q|k|v]
    [head 2p in lanes 0..63 | head 2p+1 in lanes 64..127], each head's
    real dim (<= 64) zero-padded to 64.  bias: (H, T, T) pre-scaled.
    Returns (B, T, (H//2) * 128) in the same paired lane layout.

    Requires an even head count; see :func:`_attn_paired_kernel` for why
    this halves the projection matmuls versus :func:`attention_packed`.
    """
    b, t, hd = qkv_flat.shape
    assert heads % 2 == 0, heads
    hp = heads // 2
    assert hd == hp * 3 * LANE, (hd, heads)
    sm_scale = sm_scale * LOG2E
    if not bias_log2:
        bias = bias * jnp.asarray(LOG2E, bias.dtype)
    t_pad = _round_up(t, block_q)
    if t_pad != t:
        qkv_flat = jnp.pad(qkv_flat, ((0, 0), (0, t_pad - t), (0, 0)))
    bias_p = pad_bias(bias, t, t_pad) if t_pad != t else bias
    n_q = t_pad // block_q

    grid = (hp, n_q, b)  # batch innermost: bias tile revisited, not re-fetched
    out = pl.pallas_call(
        functools.partial(_attn_paired_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, hp * LANE),
                                       qkv_flat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, LANE),
                         lambda pp, iq, bb: (bb, iq, 3 * pp)),
            pl.BlockSpec((1, t_pad, LANE),
                         lambda pp, iq, bb: (bb, 0, 3 * pp + 1)),
            pl.BlockSpec((1, t_pad, LANE),
                         lambda pp, iq, bb: (bb, 0, 3 * pp + 2)),
            # two (BQ, T) bias tiles — the pair's heads
            pl.BlockSpec((2, block_q, t_pad), lambda pp, iq, bb: (pp, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, LANE),
                               lambda pp, iq, bb: (bb, iq, pp)),
        interpret=interpret,
    )(qkv_flat, qkv_flat, qkv_flat, bias_p)
    return out[:, :t]


def _attn_packed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        sm_scale: float, sum_lane: Optional[int]):
    q = q_ref[0].astype(jnp.float32) * sm_scale  # scale on (BQ, Dp), not (BQ, T)
    k = k_ref[0].astype(jnp.float32)        # (T, Dp)
    v = v_ref[0]                             # (T, Dp)
    bias = bias_ref[0].astype(jnp.float32)   # (BQ, T)

    # log2-domain NO-MAX softmax, as in _attn_kernel
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    p = jnp.exp2(jnp.minimum(logits, _CLAMP))
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if sum_lane is not None:
        # v's padding lane ``sum_lane`` carries a constant 1.0 (planted in
        # the projection bias by the caller), so the value contraction just
        # computed the softmax denominator on the MXU — the (BQ, T) VPU
        # row-reduce is replaced by a 128-lane masked pick.  The spurious
        # 1.0 the division leaves in that output lane lands on zero-padded
        # proj_out weight rows downstream.
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        l = jnp.sum(jnp.where(lane == sum_lane, out, 0.0), axis=-1,
                    keepdims=True) + 1e-30
    else:
        l = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    o_ref[0] = (out / l).astype(o_ref.dtype)


def attention_packed(qkv_flat: jax.Array, bias: jax.Array, *, heads: int,
                     sm_scale: float, block_q: int = 256,
                     interpret: bool = False,
                     bias_log2: bool = False,
                     sum_lane: Optional[int] = None) -> jax.Array:
    """Fully layout-preserving attention on lane-padded packed projections.

    qkv_flat: (B, T, H * 3 * 128) — channel order [head][q|k|v][128-padded
    head dim] (produced by one fused pad of the qkv conv output; real head
    dim <= 128, upper lanes zero).  bias: (H, T, T) pre-scaled.
    Returns (B, T, H * 128).

    Head and q/k/v selection happen entirely in the lane-block index maps
    (block index 3*h + {0,1,2}), so neither the wrapper nor the kernel does
    any transpose or strided slice — the two operations Mosaic can't fuse
    and XLA pays ~25% of diffusion sampling time for.

    ``sum_lane``: index of a padding lane of v that the caller filled with a
    constant 1.0 (via the qkv projection bias) — lets the kernel read the
    softmax denominator out of the MXU value contraction instead of running
    a (BQ, T) VPU row-reduce.  Requires real head dim < 128.
    """
    b, t, hd = qkv_flat.shape
    d_pad = LANE
    assert hd == heads * 3 * d_pad, (hd, heads)
    sm_scale = sm_scale * LOG2E
    if not bias_log2:
        bias = bias * jnp.asarray(LOG2E, bias.dtype)
    t_pad = _round_up(t, block_q)
    if t_pad != t:
        qkv_flat = jnp.pad(qkv_flat, ((0, 0), (0, t_pad - t), (0, 0)))
    bias_p = pad_bias(bias, t, t_pad) if t_pad != t else bias
    n_q = t_pad // block_q

    # NOTE: marking the grid dims "parallel" via CompilerParams was tried and
    # measured SLOWER (33.7x vs 34.1x): reordering breaks the deliberate
    # bias-tile revisit pattern of the (h, q_block, batch) grid order.
    grid = (heads, n_q, b)
    out = pl.pallas_call(
        functools.partial(_attn_packed_kernel, sm_scale=sm_scale,
                          sum_lane=sum_lane),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, heads * d_pad),
                                       qkv_flat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad),
                         lambda hh, iq, bb: (bb, iq, 3 * hh)),
            pl.BlockSpec((1, t_pad, d_pad),
                         lambda hh, iq, bb: (bb, 0, 3 * hh + 1)),
            pl.BlockSpec((1, t_pad, d_pad),
                         lambda hh, iq, bb: (bb, 0, 3 * hh + 2)),
            pl.BlockSpec((1, block_q, t_pad), lambda hh, iq, bb: (hh, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda hh, iq, bb: (bb, iq, hh)),
        interpret=interpret,
    )(qkv_flat, qkv_flat, qkv_flat, bias_p)
    return out[:, :t]
