"""Common NN building blocks (flax.linen), NTC layout: (batch, time, channels).

The torch reference works channels-first; everything here is time-major with
channels on the last (lane) dimension, which is the layout XLA tiles best on
TPU.  Parity with torch modules is field-by-field (the checkpoint converter
transposes conv kernels).

Reference citations are given per class.
"""
from __future__ import annotations

import contextlib
import math
import threading
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1  # vqvae/modules/modules.py:13


class _MatmulDtypeState(threading.local):
    value = None


_MM_DTYPE = _MatmulDtypeState()


@contextlib.contextmanager
def matmul_dtype(dtype):
    """Mixed-precision context for matmul-class ops (Dense/Conv1d/Transpose).

    Inside the context, matmul OPERANDS are cast to ``dtype`` (bf16) while
    accumulation and outputs stay in the promoted input dtype via
    ``preferred_element_type`` — the TPU equivalent of the reference's
    ``accelerator.autocast()`` training (train.py:211 etc.): fp32
    activations/norms/softmax islands, MXU-rate matmuls.  The flag is read
    at TRACE time, so wrap the ``model.apply`` calls inside the jitted step
    (train/step.py does).
    """
    prev = _MM_DTYPE.value
    _MM_DTYPE.value = dtype
    try:
        yield
    finally:
        _MM_DTYPE.value = prev


def _mm_operand_dtype(out_dtype):
    """The operand dtype matmuls should use (AMP cast target or out_dtype)."""
    d = _MM_DTYPE.value
    if d is not None and jnp.issubdtype(out_dtype, jnp.floating):
        return jnp.dtype(d)
    return out_dtype


def autocast_active() -> bool:
    """True while tracing inside a ``matmul_dtype(...)`` context.

    Distinguishes TRAINING autocast (the context) from serving's plain
    bf16 compute dtype (inputs/weights already cast, no context) — some
    policies, e.g. bf16 attention-logits storage, apply only to the
    former."""
    return _MM_DTYPE.value is not None


class _WeightNormState(threading.local):
    value = False


_WN_REPARAM = _WeightNormState()


@contextlib.contextmanager
def weight_norm_reparam(enabled: bool = True):
    """Train with the reference's weight-norm ``(g, v)`` parameterization.

    The torch reference trains WN, HiFi-GAN and MPD convs under
    ``torch.nn.utils.weight_norm`` (modules/modules.py:152-237,
    model_24k.py:244/298-430): the stored parameters are a direction tensor
    ``v`` and a per-channel magnitude ``g`` and the effective kernel is
    ``g * v / ||v||``.  The gradient geometry of that reparameterization is
    load-bearing for GAN stability, so training reproduces it exactly.

    Inside this context, convs declared with ``weight_norm=True`` (only the
    call sites the reference wraps) create ``v``/``g`` params instead of
    ``kernel``.  The flag is read at TRACE time — wrap both ``init`` and the
    train-step ``apply`` (train/step.py does).  Serving never enables it and
    keeps folded kernels (io/torch_convert.py folds at conversion); use
    ``fold_weight_norm_tree`` / ``unfold_weight_norm_tree`` to move a
    checkpoint between the two parameterizations.
    """
    prev = _WN_REPARAM.value
    _WN_REPARAM.value = enabled
    try:
        yield
    finally:
        _WN_REPARAM.value = prev


def _wn_norm(v: jax.Array) -> jax.Array:
    """fp32 L2 norm of ``v`` over all axes except the last (per out-channel).

    Every kernel layout here keeps the weight-norm channel axis LAST
    (Conv1d (k, in, out); ConvTranspose1d (k, out, in) — torch norms
    transposed convs per INPUT channel, dim=0 of its (in, out, k) weight;
    Conv2d (kh, kw, in, out)), so one rule covers all three.
    """
    v32 = v.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(jnp.square(v32), axis=tuple(range(v.ndim - 1))))


def _wn_params(module: nn.Module, shape: Tuple[int, ...],
               kernel_init: Callable) -> jax.Array:
    """Declare ``v``/``g`` and return the effective fp32 kernel.

    ``g`` initializes to ``||v||`` so the effective initial weight equals the
    plain-kernel init (torch ``weight_norm`` wraps an initialized conv the
    same way; the reference's later ``apply(init_weights)`` on wrapped convs
    is a no-op because the pre-forward hook recomputes ``weight`` from g, v).
    """
    v = module.param("v", kernel_init, shape)
    g = module.param("g", lambda rng: _wn_norm(v))
    return v.astype(jnp.float32) * (
        g.astype(jnp.float32) / jnp.maximum(_wn_norm(v), 1e-12))


def fold_weight_norm_tree(tree):
    """Replace every ``{v, g}`` conv entry with the folded ``kernel``.

    Converts a params tree created under :func:`weight_norm_reparam` into
    the serving parameterization (exact forward equivalence).
    """
    def rec(node):
        if isinstance(node, dict):
            if "v" in node and "g" in node and "kernel" not in node:
                rest = {k: rec(x) for k, x in node.items()
                        if k not in ("v", "g")}
                v, g = jnp.asarray(node["v"]), jnp.asarray(node["g"])
                kernel = v.astype(jnp.float32) * (
                    g.astype(jnp.float32) / jnp.maximum(_wn_norm(v), 1e-12))
                return {"kernel": kernel.astype(v.dtype), **rest}
            return {k: rec(x) for k, x in node.items()}
        return node
    return rec(tree)


def unfold_weight_norm_tree(tree, template):
    """Split folded ``kernel`` entries into ``{v, g}`` where ``template``
    (a tree created under :func:`weight_norm_reparam`) has them.

    ``g = ||w||``, ``v = w`` — the identity torch ``weight_norm`` applies
    when wrapping an existing conv; lets a folded (serving / converted)
    checkpoint resume reparameterized training.
    """
    def rec(node, tmpl):
        if isinstance(node, dict):
            if ("kernel" in node and isinstance(tmpl, dict)
                    and "v" in tmpl and "g" in tmpl and "kernel" not in tmpl):
                rest = {k: rec(x, tmpl.get(k)) for k, x in node.items()
                        if k != "kernel"}
                w = node["kernel"]
                return {"v": w, "g": _wn_norm(jnp.asarray(w)), **rest}
            return {k: rec(x, tmpl.get(k) if isinstance(tmpl, dict) else None)
                    for k, x in node.items()}
        return node
    return rec(tree, template)


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """(B,) lengths -> (B, T) bool mask (commons.py:144).

    Bool (not fp32) so ``x * mask`` follows the activation dtype — a fp32
    mask would silently promote a bf16 chain back to fp32.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) (modules.py:497-502)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class _Conv1dCore(nn.Module):
    """Conv1d math with an MXU-friendly tap-matmul path.

    Param names/shapes match flax ``nn.Conv`` (kernel (k, in/g, out), bias
    (out,)) so checkpoints are layout-identical.

    XLA's TPU lowering of 1-D convolutions runs far below matmul MFU (the
    diffusion out_convs measured ~18% MFU in the round-3 trace).  For
    stride-1, ungrouped convs with small kernels the exact same result is
    ``sum_k shift(x, k*dil) @ kernel[k]`` — k ordinary dots the MXU tiles
    well; the shifted reads fuse into the dot operands.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    dilation: int
    groups: int
    use_bias: bool
    kernel_init: Callable
    weight_norm: bool = False

    # tap-matmul only when it is an exact rewrite and small enough to win;
    # below ~64 channels the dots underfill MXU lanes and the conv lowering
    # wins again (measured: the HiFi-GAN small-channel tail regressed
    # 0.25s -> 0.36s under taps, the 768-ch diffusion stack gained 0.4s)
    _TAP_MAX_K = 8
    _TAP_MIN_CH = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        in_ch = x.shape[-1]
        shape = (k, in_ch // self.groups, self.features)
        if self.weight_norm and _WN_REPARAM.value:
            kernel = _wn_params(self, shape, self.kernel_init)
        else:
            kernel = self.param("kernel", self.kernel_init, shape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        # nn.Conv promotion semantics: common dtype of input and params;
        # under matmul_dtype() the op runs in bf16 (fp32 MXU accumulation is
        # implicit on TPU) and the output is cast back up — exactly torch
        # autocast's conv behaviour, and VJP-consistent (mixed-dtype conv
        # operands are not differentiable in jax)
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        op_dtype = _mm_operand_dtype(dtype)
        x = x.astype(op_dtype)
        kernel = kernel.astype(op_dtype)

        taps = (self.stride == 1 and self.groups == 1 and k <= self._TAP_MAX_K
                and x.ndim == 3
                and min(in_ch, self.features) >= self._TAP_MIN_CH)
        if taps:
            t_out = x.shape[1] + 2 * self.padding - (k - 1) * self.dilation
            if t_out > 0:
                xp = (jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
                      if self.padding else x)
                y = None
                for i in range(k):
                    off = i * self.dilation
                    tap = jax.lax.slice_in_dim(xp, off, off + t_out, axis=1)
                    d = jnp.dot(tap, kernel[i])
                    y = d if y is None else y + d
                y = y.astype(dtype)
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                return y

        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NWC", "WIO", "NWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,), dimension_numbers=dn,
            feature_group_count=self.groups).astype(dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class Conv1d(nn.Module):
    """torch.nn.Conv1d equivalent on NTC tensors.

    ``padding`` follows the torch convention (symmetric zero-pad count).
    Kernel layout is (k, in_per_group, out) as in flax; the converter maps
    torch (out, in_per_group, k) kernels onto it.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    # the reference wraps this conv in torch weight_norm; (g, v) params
    # under the weight_norm_reparam() training context, folded otherwise
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _Conv1dCore(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            weight_norm=self.weight_norm,
            name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d equivalent on NTC tensors.

    out_len = (L-1)*stride - 2*padding + kernel_size + output_padding.
    Implemented as an input-dilated convolution with a spatially-flipped
    kernel — the exact transpose-convolution definition torch uses.
    Kernel param layout: (k, out, in) (converter maps torch (in, out, k)).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    # torch weight_norm on ConvTranspose1d norms dim=0 of its (in, out, k)
    # weight — PER INPUT CHANNEL, which is the last axis of our layout
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        shape = (self.kernel_size, self.features, in_features)
        if self.weight_norm and _WN_REPARAM.value:
            kernel = _wn_params(self, shape, nn.initializers.lecun_normal())
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Flip spatially, put dims as (k, in, out) for WIO.
        w = jnp.flip(kernel, axis=0).transpose(0, 2, 1)
        pad = self.kernel_size - 1 - self.padding
        dtype = jnp.promote_types(x.dtype, w.dtype)
        op_dtype = _mm_operand_dtype(dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(op_dtype),
            w.astype(op_dtype),
            window_strides=(1,),
            padding=[(pad, pad + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).astype(dtype)
        return y + bias.astype(y.dtype)


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent on NHWC tensors, weight-norm-capable.

    Param layout matches flax ``nn.Conv`` (kernel (kh, kw, in, out), bias)
    so existing checkpoints are path-identical; unlike ``nn.Conv`` it
    supports the (g, v) reparameterization (the reference weight-norms every
    DiscriminatorP conv, model_24k.py:303-353) and the AMP operand cast
    that the 1-D convs here already honour.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        shape = (kh, kw, x.shape[-1], self.features)
        if self.weight_norm and _WN_REPARAM.value:
            kernel = _wn_params(self, shape, self.kernel_init)
        else:
            kernel = self.param("kernel", self.kernel_init, shape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        op_dtype = _mm_operand_dtype(dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(op_dtype), kernel.astype(op_dtype),
            window_strides=self.strides,
            padding=[tuple(p) for p in self.padding],
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class TorchLayerNorm(nn.Module):
    """LayerNorm over the channel (last) dim, eps=1e-5 (torch default).

    Statistics compute in fp32 (precision island); output returns to the
    input dtype so a bf16 activation chain stays bf16.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32)(x)
        return y.astype(x.dtype)


def group_norm_groups(channels: int) -> int:
    """Reference ``normalization`` group count rule (diff_util.py:118-133)."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


class _GroupNormCore(nn.Module):
    """Fused-apply GroupNorm: fp32 statistics, input-dtype big-tensor math.

    The statistics reduce in fp32 (the point of the reference's GroupNorm32,
    diff_util.py:113-115) but the normalization is algebraically folded into
    ONE per-(batch, channel) multiply-add applied in the input dtype:
    ``y = x * (inv*scale) + (bias - mean*inv*scale)``.  A bf16 activation is
    therefore read once and written once in bf16 — no fp32 copy of the
    activation is ever materialized and no convert kernels surround the norm
    (they cost ~0.6 s/run in the round-1 diffusion trace).
    """

    groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        assert x.ndim == 3, "GroupNorm32 expects (B, T, C)"
        b, t, _ = x.shape
        n = t * (c // g)
        # Stats in two stages: a LANE-ALIGNED reduction over T only (full
        # memory bandwidth; fp32-accumulated sibling sums multi-output-fuse
        # into one pass), then a tiny per-group fold.  Reducing (T, C/G)
        # directly makes XLA emit a segmented-lane reduce (24 of 128 lanes
        # per group) that runs far below HBM bandwidth.
        # E[x^2]-m^2 in fp32 is safe at activation scales (|x| ~ 1e1):
        # worst-case cancellation leaves ~4 significant digits of variance.
        s1 = jnp.sum(x, axis=1, dtype=jnp.float32)               # (B, C)
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1)  # (B, C)
        mean = jnp.sum(s1.reshape(b, g, c // g), axis=-1) / n    # (B, G)
        mean_sq = jnp.sum(s2.reshape(b, g, c // g), axis=-1) / n
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)  # (B, G)

        mul = jnp.repeat(inv, c // g, axis=-1) * scale[None]           # (B, C)
        add = bias[None] - jnp.repeat(mean * inv, c // g, axis=-1) * scale[None]
        return (x * mul.astype(x.dtype)[:, None, :]
                + add.astype(x.dtype)[:, None, :])


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics (diff_util.py:113-115), NTC layout.

    Param names match nn.GroupNorm (scale/bias under GroupNorm_0) for
    checkpoint compatibility; the apply is the fused input-dtype form
    (:class:`_GroupNormCore`).
    """

    channels: int
    groups: Optional[int] = None
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.groups if self.groups is not None else group_norm_groups(self.channels)
        return _GroupNormCore(groups=g, epsilon=self.epsilon,
                              name="GroupNorm_0")(x)


class _DenseCore(nn.Module):
    """nn.Dense-compatible params (kernel (in, out), bias) with AMP support."""

    features: int
    use_bias: bool
    kernel_init: Callable

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        op_dtype = _mm_operand_dtype(dtype)
        y = jnp.dot(x.astype(op_dtype), kernel.astype(op_dtype)).astype(dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class Dense(nn.Module):
    """nn.Linear equivalent (kernel (in, out); converter transposes torch)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _DenseCore(self.features, use_bias=self.use_bias,
                          kernel_init=self.kernel_init, name="dense")(x)


class Embed(nn.Module):
    """Embedding table with configurable init std."""

    num_embeddings: int
    features: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=self.init_std),
            (self.num_embeddings, self.features),
        )
        return jnp.take(table, ids, axis=0)


def fused_gate(x: jax.Array) -> jax.Array:
    """tanh(a) * sigmoid(b) over a channel-split (modules.py:16-22), NTC."""
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def rand_slice_starts(rng: jax.Array, lengths: jax.Array, segment_size: int) -> jax.Array:
    """Random per-example slice starts (commons.py:76-84)."""
    max_starts = jnp.maximum(lengths - segment_size + 1, 1).astype(jnp.float32)
    u = jax.random.uniform(rng, lengths.shape)
    return (u * max_starts).astype(jnp.int32)


def slice_segments(x: jax.Array, starts: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size time slices per batch element; x is (B, T, C)."""
    def take(xi, si):
        return jax.lax.dynamic_slice_in_dim(xi, si, segment_size, axis=0)

    return jax.vmap(take)(x, starts)
