"""Diffusion-net building blocks (vqvae/utils/diff_util.py, vqvae/diff_model.py), NTC.

* :class:`T5RelativePositionBias` — bucketed relative attention bias
  (xtransformers.py:146-186; num_buckets=32, max_distance=64 in AttentionBlock).
* :class:`AttentionBlock` — GroupNorm32 -> qkv 1x1 -> legacy-scaled attention
  (scale applied to q and k as 1/sqrt(sqrt(ch))) -> zero-init proj, residual.
* :class:`DiffResBlock` — scale-shift GroupNorm FiLM residual block.
* :class:`DiffusionLayer` — DiffResBlock + AttentionBlock.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.nn.common import (Conv1d, Dense, GroupNorm32,
                                      _mm_operand_dtype, autocast_active)


def _round_up_8(x: int) -> int:
    return -(-x // 8) * 8


@jax.custom_vjp
def softmax_lowp(logits: jax.Array) -> jax.Array:
    """Last-axis softmax with fp32 internals but LOW-PRECISION storage.

    With bf16 autocast active, the XLA training-attention path materializes
    the (B, H, T, S) logits and probability tensors in HBM in both
    directions — the dominant traffic of the diff train step at T=496
    (kernel census in CLAUDE.md).  Plain ``jax.nn.softmax`` would upcast and
    save an fp32 residual for its VJP; this wrapper keeps the softmax math
    in fp32 registers while pinning every saved/stored tensor to the input
    dtype (the same contract torch autocast gives a bmm -> softmax -> bmm
    chain, where the bmm outputs are half precision).  Backward recomputes
    ``dlogits = w * (g - sum(g * w))`` in fp32 from the bf16 ``w``.
    """
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1) \
        .astype(logits.dtype)


def _softmax_lowp_fwd(logits):
    w = softmax_lowp(logits)
    return w, w


def _softmax_lowp_bwd(w, g):
    gw = g.astype(jnp.float32) * w.astype(jnp.float32)
    d = gw - w.astype(jnp.float32) * jnp.sum(gw, axis=-1, keepdims=True)
    return (d.astype(w.dtype),)


softmax_lowp.defvjp(_softmax_lowp_fwd, _softmax_lowp_bwd)


def relative_position_bucket(relative_position: jax.Array, num_buckets: int = 32,
                             max_distance: int = 128) -> jax.Array:
    """Non-causal T5 bucketing (xtransformers.py:155-175)."""
    n = -relative_position
    num_buckets //= 2
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5RelativePositionBias(nn.Module):
    scale: float
    heads: int
    num_buckets: int = 32
    max_distance: int = 64

    @nn.compact
    def __call__(self, length: int) -> jax.Array:
        """Returns bias (1, heads, L, L) to add to qk logits."""
        pos = jnp.arange(length)
        rel = pos[None, :] - pos[:, None]
        buckets = relative_position_bucket(rel, self.num_buckets, self.max_distance)
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num_buckets, self.heads))
        # one-hot matmul instead of jnp.take: identical forward values, but
        # the table GRADIENT becomes an (N, L*L)@(L*L, H) MXU matmul instead
        # of a 246k-update scatter-add — the scatter was 30% of the whole
        # diff training step (13 blocks x 16 microbatches x 2.08 ms, traced).
        # buckets are static, so the one-hot is loop-invariant and hoists
        # out of the grad-accumulation scan.
        onehot = (buckets[..., None] ==
                  jnp.arange(self.num_buckets)).astype(table.dtype)
        values = jnp.einsum("ijn,nh->ijh", onehot, table)  # (L, L, H)
        return values.transpose(2, 0, 1)[None] * self.scale


class AttentionBlock(nn.Module):
    """diff_util.AttentionBlock (diff_util.py:172-215).

    Two execution paths with identical math:
    * XLA (default off-TPU): materialized logits + softmax;
    * Pallas row-block kernel (TPU): logits stay in VMEM; the T5 bias may be
      precomputed once per sampling call and passed as ``bias`` (H, T, T) —
      critical for hoisting it out of the diffusion sampling scan.
    """

    channels: int
    num_heads: int = 1
    relative_pos_embeddings: bool = False

    def setup(self):
        self.norm = GroupNorm32(self.channels, name="norm")
        self.qkv = Conv1d(3 * self.channels, 1, name="qkv")
        self.proj_out = Conv1d(self.channels, 1,
                               kernel_init=nn.initializers.zeros,
                               name="proj_out")
        if self.relative_pos_embeddings:
            ch = self.channels // self.num_heads
            self.rel_pos = T5RelativePositionBias(
                scale=ch ** 0.5, heads=self.num_heads, num_buckets=32,
                max_distance=64, name="rel_pos")

    def bias_values(self, length: int) -> jax.Array:
        """Pre-scaled additive bias (H, L, L) — t-independent, hoistable."""
        return self.rel_pos(length)[0]

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 use_pallas: Optional[bool] = None) -> jax.Array:
        """x: (B, T, C). mask: optional (B, T) multiplicative post-softmax
        mask (the reference multiplies after softmax, diff_util.py:163-166).

        A precomputed ``bias`` must be LOG2-DOMAIN (pre-multiplied by
        log2(e), as :meth:`DiffusionTts.attention_biases` returns it): the
        pallas kernel runs an exp2 softmax and the hoist bakes the factor in
        once per sampling call instead of once per step."""
        b, t, c = x.shape
        h = self.num_heads
        ch = c // h
        y = self.norm(x)

        precomputed = bias is not None
        if bias is None and self.relative_pos_embeddings:
            bias = self.bias_values(t)

        if use_pallas is None:
            # kernel is forward-only (no VJP): use it only on the inference
            # path, which is exactly when the bias arrives precomputed
            use_pallas = (jax.default_backend() == "tpu" and mask is None
                          and precomputed)
        if use_pallas and not self.is_initializing():
            from detail_tts_tpu.ops.pallas.attention import (
                attention_packed, attention_packed_pairs, pad_bias,
                pick_block_q, pick_block_q_paired, row_block_attention)

            interp = jax.default_backend() != "tpu"
            blk_q = int(os.environ.get("DTTS_ATTN_BLOCK_Q", "0")) or \
                pick_block_q(t)
            packed = os.environ.get("DTTS_ATTN_PACKED", "1") == "1"
            paired = os.environ.get("DTTS_ATTN_PAIRED", "1") == "1"
            wk = self.qkv.variables["params"]["conv"]["kernel"]  # (1, C, 3C)
            wb = self.qkv.variables["params"]["conv"]["bias"]
            pw = self.proj_out.variables["params"]["conv"]["kernel"]  # (1,C,C)
            pb = self.proj_out.variables["params"]["conv"]["bias"]

            if packed and paired and ch <= 64 and h % 2 == 0:
                # Two heads per 128-lane block: at the trunk's head dim 48
                # the one-head packing pads 48 -> 128 (2.67x matmul FLOPs);
                # pair packing pads 48 -> 64 (1.33x), halving the qkv and
                # proj_out matmuls — which the serving trace shows are the
                # largest non-attention block of diffusion device time
                # (1.25 ms/step/layer at (16, 1600, 768) @ (768, 6144)).
                dh = 64
                wkp = jnp.pad(wk.reshape(c, h, 3, ch),
                              ((0, 0), (0, 0), (0, 0), (0, dh - ch)))
                wkp = wkp.reshape(c, h // 2, 2, 3, dh).transpose(0, 1, 3, 2, 4)
                wbp = jnp.pad(wb.reshape(h, 3, ch),
                              ((0, 0), (0, 0), (0, dh - ch)))
                wbp = wbp.reshape(h // 2, 2, 3, dh).transpose(0, 2, 1, 3)
                qkv = y @ wkp.reshape(c, h // 2 * 3 * 128).astype(y.dtype) \
                    + wbp.reshape(-1)
                blk_qp = int(os.environ.get("DTTS_ATTN_BLOCK_Q", "0")) or \
                    pick_block_q_paired(t)
                a = attention_packed_pairs(qkv, bias.astype(y.dtype), heads=h,
                                           sm_scale=1.0 / math.sqrt(ch),
                                           block_q=blk_qp, interpret=interp,
                                           bias_log2=precomputed)
                pwp = jnp.pad(pw[0].reshape(h, ch, c),
                              ((0, 0), (0, dh - ch), (0, 0)))
                pwp = pwp.reshape(h // 2 * 2 * dh, c)
                return x + (a @ pwp.astype(a.dtype) + pb.astype(a.dtype))

            if packed and ch <= 128:
                # Zero-transpose path: head-dim padded to 128 INSIDE the qkv
                # and proj weights; the kernel selects head/q/k/v purely via
                # lane-block index maps on the raw (B, T, H*3*128) matmul
                # output.  ~2x qkv/proj matmul FLOPs buys away both layout
                # copies (the copies cost more at serving shapes).
                dp = 128
                wkp = jnp.pad(wk.reshape(c, h, 3, ch),
                              ((0, 0), (0, 0), (0, 0), (0, dp - ch)))
                wbp = jnp.pad(wb.reshape(h, 3, ch),
                              ((0, 0), (0, 0), (0, dp - ch)))
                # plant 1.0 in v's first padding lane: the kernel then reads
                # the softmax denominator out of its MXU value contraction
                # (sum_lane) instead of a (BQ, T) VPU row-reduce.  OFF by
                # default: traced A/B at serving shapes shows the kernel is
                # MXU/VPU-balanced and pipelined — the row-reduce rides free
                # under the matmuls (device attn 1.185s vs 1.160s baseline,
                # i.e. the "saving" costs ~2%).  Kept for VPU-starved shapes.
                sum_lane = ch if ch < dp and \
                    os.environ.get("DTTS_ATTN_MXU_SUM", "0") == "1" else None
                if sum_lane is not None:
                    wbp = wbp.at[:, 2, sum_lane].set(1.0)
                qkv = y @ wkp.reshape(c, h * 3 * dp).astype(y.dtype) \
                    + wbp.reshape(-1)
                a = attention_packed(qkv, bias.astype(y.dtype), heads=h,
                                     sm_scale=1.0 / math.sqrt(ch),
                                     block_q=blk_q, interpret=interp,
                                     bias_log2=precomputed,
                                     sum_lane=sum_lane)
                pwp = jnp.pad(pw[0].reshape(h, ch, c),
                              ((0, 0), (0, dp - ch), (0, 0))).reshape(h * dp, c)
                return x + (a @ pwp.astype(a.dtype) + pb.astype(a.dtype))

            # Transposed path: head-dim pad folded into weights (ch -> 64),
            # q/k/v contiguous after one (B,T,H,3,64) -> (3,B,H,T,64)
            # transpose; one transpose back on the output.
            dp = 64 if ch <= 64 else -(-ch // 128) * 128
            wk = jnp.pad(wk.reshape(c, h, 3, ch),
                         ((0, 0), (0, 0), (0, 0), (0, dp - ch)))
            wb = jnp.pad(wb.reshape(h, 3, ch),
                         ((0, 0), (0, 0), (0, dp - ch)))
            qkv = y @ wk.reshape(c, h * 3 * dp).astype(y.dtype) + wb.reshape(-1)
            qkv = qkv.reshape(b, t, h, 3, dp).transpose(3, 0, 2, 1, 4)
            t_pad = -(-t // blk_q) * blk_q
            if t_pad != t:
                qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, t_pad - t),
                                    (0, 0)))
                bias = pad_bias(bias.astype(y.dtype), t, t_pad)
            a = row_block_attention(qkv[0], qkv[1], qkv[2],
                                    bias.astype(qkv.dtype),
                                    sm_scale=1.0 / math.sqrt(ch),
                                    block_q=blk_q, interpret=interp,
                                    bias_log2=precomputed)
            a = a[:, :, :t].transpose(0, 2, 1, 3).reshape(b, t, h * dp)
            pwp = jnp.pad(pw[0].reshape(h, ch, c),
                          ((0, 0), (0, dp - ch), (0, 0))).reshape(h * dp, c)
            return x + (a @ pwp.astype(a.dtype) + pb.astype(a.dtype))
        else:
            qkv = self.qkv(y)  # (B, T, 3C), layout [q|k|v] per head
            qkv = qkv.reshape(b, t, h, 3 * ch).transpose(0, 2, 1, 3)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            # trainable flash-style kernel (custom VJP): same math with no
            # (B, H, T, T) logits in HBM in either direction.  OFF by
            # default: at the reference training shapes (T=496, H=16) XLA's
            # fused logits path wins — re-measured AFTER the T5-scatter fix
            # (traced A/B: jit_step 0.670 s XLA vs 0.852 s pallas device;
            # the kernel's layout copies + bwd logits recompute cost more
            # than the ~500-frame logits traffic saves).  Opt in with
            # DTTS_TRAIN_ATTN=pallas for long-T training where the
            # materialized logits dominate HBM traffic.
            use_train_kernel = (
                jax.default_backend() == "tpu" and mask is None
                and bias is not None and not precomputed
                and not self.is_initializing() and ch <= 128
                and os.environ.get("DTTS_TRAIN_ATTN", "xla") == "pallas")
            if use_train_kernel:
                from detail_tts_tpu.ops.pallas.attention import (
                    attention_train_padded)

                a = attention_train_padded(
                    q, k, v, bias.astype(jnp.float32),
                    sm_scale=1.0 / math.sqrt(ch),
                    block_q=min(256, _round_up_8(t)))
                a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
                return x + self.proj_out(a)

            scale = 1.0 / math.sqrt(math.sqrt(ch))
            # matmul_dtype autocast covers Dense/Conv1d but not raw einsums;
            # cast the attention dot OPERANDS like torch autocast does for
            # bmm (fp32 einsums here ran at ~13 effective TFLOPs and were
            # the largest block of the diff train step after the scatter
            # fix).  Accumulation/softmax stay fp32.
            mdt = _mm_operand_dtype(x.dtype)
            # Under bf16 autocast, ALSO store the (B,H,T,S) logits and
            # probability tensors in bf16 (torch autocast's bmm outputs are
            # half precision too; softmax math stays fp32 in softmax_lowp).
            # This halves the dominant HBM traffic of the diff train step at
            # T=496.  DTTS_ATTN_LOGITS=fp32 reverts to fp32 storage.
            # GATED ON THE TRAINING AUTOCAST CONTEXT, not on bf16 inputs:
            # the serving engine runs bf16 WITHOUT the context, and bf16
            # logits storage there measured a real RTF loss (43.6x -> 37.7x
            # batch 8 — the fp32-logits serving programs are what the
            # serving roofline was built on; keep them).
            lowp = (autocast_active() and mdt != jnp.float32 and
                    os.environ.get("DTTS_ATTN_LOGITS", "lowp") == "lowp")
            acc_dt = mdt if lowp else jnp.float32
            logits = jnp.einsum("bhtd,bhsd->bhts",
                                (q * scale).astype(mdt),
                                (k * scale).astype(mdt),
                                preferred_element_type=acc_dt)
            if bias is not None:
                if precomputed:  # log2-domain -> natural
                    bias = bias * jnp.asarray(1.0 / 1.4426950408889634,
                                              bias.dtype)
                logits = logits + bias[None].astype(acc_dt)
            w = softmax_lowp(logits) if lowp \
                else jax.nn.softmax(logits, axis=-1)
            if mask is not None:
                w = w * mask[:, None, None, :]
            a = jnp.einsum("bhts,bhsd->bhtd", w.astype(mdt), v.astype(mdt),
                           preferred_element_type=jnp.float32).astype(x.dtype)
            a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
        return x + self.proj_out(a)


class DiffResBlock(nn.Module):
    """diff_model.ResBlock with use_scale_shift_norm (diff_model.py:59-119)."""

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: Optional[int] = None
    kernel_size: int = 3
    use_scale_shift_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        out_ch = self.out_channels or self.channels
        pad = {1: 0, 3: 1, 5: 2}[self.kernel_size]

        h = GroupNorm32(self.channels, name="in_norm")(x)
        h = jax.nn.silu(h)
        h = Conv1d(out_ch, 1, name="in_conv")(h)  # efficient_config: 1x1

        e = jax.nn.silu(emb)
        e = Dense(2 * out_ch if self.use_scale_shift_norm else out_ch, name="emb")(e)
        e = e[:, None, :]  # (B, 1, ...)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm32(out_ch, name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + e
            h = GroupNorm32(out_ch, name="out_norm")(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = Conv1d(out_ch, self.kernel_size, padding=pad, name="out_conv")(h)

        if out_ch == self.channels:
            skip = x
        else:
            skip = Conv1d(out_ch, 1, name="skip")(x)
        return skip + h


class DiffusionLayer(nn.Module):
    """ResBlock + rel-pos AttentionBlock (diff_model.py:122-130)."""

    model_channels: int
    dropout: float
    num_heads: int

    def setup(self):
        self.resblk = DiffResBlock(
            self.model_channels, self.model_channels, self.dropout,
            self.model_channels, use_scale_shift_norm=True, name="resblk")
        self.attn = AttentionBlock(self.model_channels, self.num_heads,
                                   relative_pos_embeddings=True, name="attn")

    def __call__(self, x: jax.Array, time_emb: jax.Array,
                 deterministic: bool = True,
                 attn_bias: Optional[jax.Array] = None) -> jax.Array:
        y = self.resblk(x, time_emb, deterministic=deterministic)
        return self.attn(y, bias=attn_bias)


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding (diff_model.py:20-38); fp32."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
