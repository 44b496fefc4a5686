"""matmul_dtype autocast coverage: the bf16 operand casts actually engage
(outputs change vs fp32) and stay within bf16 round-off of the fp32 result.

The context mirrors torch.cuda.amp.autocast as the reference's trainer uses
it (train.py:171-178): matmul-class ops (Linear/Conv/bmm) run with bf16
operands, accumulation and everything else (norms, softmax, losses) in
fp32.  Coverage here is module-level — the attention einsums gained explicit
operand casts (rel_attention/style_encoder/diff_blocks) that Dense/Conv1d's
shared _mm_operand_dtype hook does not reach.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detail_tts_tpu.nn.common import Conv1d, Dense, matmul_dtype
from detail_tts_tpu.nn.diff_blocks import AttentionBlock
from detail_tts_tpu.nn.rel_attention import RelPosMultiHeadAttention
from detail_tts_tpu.nn.style_encoder import StyleSelfAttention

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below


def _run(module, *args, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = module.init(rng, *args, **kwargs)
    # randomize every param: zero-init layers (e.g. AttentionBlock's
    # residual proj_out, diff_blocks.py) would otherwise mask the whole
    # attention computation and make the cast invisible
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.2
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for k, l in zip(keys, leaves)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    fp32 = module.apply(variables, *args, **kwargs)
    with matmul_dtype(jnp.bfloat16):
        amp = jax.jit(module.apply)(variables, *args, **kwargs)
    return np.asarray(fp32), np.asarray(amp)


def _check(fp32, amp):
    # the cast must actually engage (bit-identical would mean the context
    # was ignored) ...
    assert not np.array_equal(fp32, amp), "autocast had no effect"
    # ... while staying within bf16 round-off of the fp32 computation
    scale = np.abs(fp32).max() + 1e-6
    assert np.abs(fp32 - amp).max() / scale < 3e-2
    assert amp.dtype == np.float32  # outputs stay fp32 (fp32 islands intact)


def test_dense_autocast():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 64))
    _check(*_run(Dense(32), x))


def test_conv1d_autocast():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 64))
    _check(*_run(Conv1d(128, 3, padding=1), x))        # tap path (ch >= 64)
    _check(*_run(Conv1d(32, 3, padding=1), x))          # conv-op path


def test_diffusion_attention_autocast():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 40, 64))
    _check(*_run(AttentionBlock(64, 4, relative_pos_embeddings=True), x))


def test_rel_pos_attention_autocast():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 40, 64))
    _check(*_run(RelPosMultiHeadAttention(64, 64, 4), x, x))


def test_style_attention_autocast():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 40, 64))
    _check(*_run(StyleSelfAttention(64, 4, 0.0), x))


def test_attention_lowp_logits_storage():
    """Under bf16 autocast the diff attention stores the (B,H,T,S) logits
    and probabilities in bf16 (softmax_lowp custom-VJP, fp32 internals) —
    the dominant HBM traffic of the diff train step at T=496.  Pins:
    (a) the lowp path stays within bf16 round-off of fp32-logits storage in
    fwd AND grad, (b) the custom-VJP actually engages (its primitive is in
    the jaxpr) and is absent under DTTS_ATTN_LOGITS=fp32."""
    import os

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 40, 64))
    m = AttentionBlock(64, 4, relative_pos_embeddings=True)
    v = m.init(jax.random.PRNGKey(0), x)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    v = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(k, l.shape, l.dtype) * 0.2 for k, l in
        zip(keys, leaves)])

    def run(mode):
        # FRESH closure per mode + clear_caches: jax caches traces keyed on
        # function identity + avals, so retracing the same callable would
        # silently ignore the env change (env vars are trace-time state,
        # set per process in real use — bench_train.py / trainer).
        def loss(variables, xx):
            with matmul_dtype(jnp.bfloat16):
                return jnp.sum(m.apply(variables, xx) ** 2)

        prev = os.environ.get("DTTS_ATTN_LOGITS")
        os.environ["DTTS_ATTN_LOGITS"] = mode
        jax.clear_caches()
        try:
            val, grads = jax.value_and_grad(loss)(v, x)
            jaxpr = str(jax.make_jaxpr(loss)(v, x))
        finally:
            if prev is None:
                os.environ.pop("DTTS_ATTN_LOGITS")
            else:
                os.environ["DTTS_ATTN_LOGITS"] = prev
        return float(val), grads, jaxpr

    val_l, g_l, jx_l = run("lowp")
    val_f, g_f, jx_f = run("fp32")
    # the logits dot emits bf16 under lowp, fp32 otherwise (custom_vjp
    # inlines on a primal trace, so check the dot output dtype instead)
    assert "bf16[2,4,40,40] = dot_general" in jx_l
    assert "bf16[2,4,40,40] = dot_general" not in jx_f
    assert "f32[2,4,40,40] = dot_general" in jx_f
    assert abs(val_l - val_f) / (abs(val_f) + 1e-6) < 3e-2
    err = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max()
        / (np.abs(np.asarray(b)).max() + 1e-6), g_l, g_f)
    assert max(jax.tree_util.tree_leaves(err)) < 5e-2


def test_serving_bf16_keeps_fp32_logits_storage():
    """REGRESSION GUARD: the serving engine runs bf16 inputs/weights WITHOUT
    the matmul_dtype context — bf16 logits storage there measured a real
    43.6x -> 37.7x batch-8 RTF loss (round 4), so lowp must key on
    autocast_active(), never on operand dtype alone.  Serving-style apply
    (bf16 params+input, no ctx) must trace an fp32 logits dot."""
    x16 = jax.random.normal(jax.random.PRNGKey(7), (2, 40, 64)) \
        .astype(jnp.bfloat16)
    m = AttentionBlock(64, 4, relative_pos_embeddings=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 40, 64), jnp.float32))
    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
    jx = str(jax.make_jaxpr(lambda vv, xx: m.apply(vv, xx))(v16, x16))
    assert "f32[2,4,40,40] = dot_general" in jx
    assert "bf16[2,4,40,40] = dot_general" not in jx


def test_autocast_scoped():
    """Outside the context everything is bit-identical fp32 (the flag is
    trace-time thread-local state; leaking it would silently degrade
    numerics of later fp32 code)."""
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 24, 64))
    m = Dense(32)
    v = m.init(jax.random.PRNGKey(0), x)
    before = m.apply(v, x)
    with matmul_dtype(jnp.bfloat16):
        m.apply(v, x)
    after = m.apply(v, x)
    assert np.array_equal(np.asarray(before), np.asarray(after))
