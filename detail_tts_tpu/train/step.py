"""Jitted training steps: staged single-loss path + two-phase GAN path.

Replaces the reference trainer's inner loop (train.py:199-460) with pure,
jit-compiled step functions:

* single-loss targets {vqvae, gpt, diff}: gradient accumulation is a
  ``lax.scan`` over a leading microbatch axis (the reference loops 16x in
  Python, train.py:212-221); grads are masked to the stage's trainable
  subtree, clipped by global norm 1.0, AdamW-updated with a staircase
  exponential-decay LR.
* GAN targets {flowvae, all}: discriminator update first, then the
  generator update against the *updated* discriminator (the reference's
  phase order, train.py:294-320/369-397); mel reconstruction loss uses the
  in-graph JAX mel frontend.

Everything is written against global arrays: under a sharded ``jax.jit``
the batch axis is split over the mesh's ``data`` axis and the gradient
all-reduce is compiler-inserted (no explicit collectives needed — see
parallel/mesh.py).
"""
from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from detail_tts_tpu.audio.mel import MelFrontend
from detail_tts_tpu.config import Config
from detail_tts_tpu.models.diffusion import DiffusionSchedule
from detail_tts_tpu.models.discriminator import MultiPeriodDiscriminator
from detail_tts_tpu.models.synthesizer import SynthesizerTrn, make_train_schedule
from detail_tts_tpu.nn.common import (matmul_dtype, slice_segments,
                                      weight_norm_reparam)


def _amp_ctx_factory(cfg: Config):
    """Trace context for the step's forwards: autocast (TrainConfig.use_bf16)
    + torch-parity weight-norm (g, v) reparam (TrainConfig.weight_norm)."""
    @contextlib.contextmanager
    def ctx():
        with contextlib.ExitStack() as stack:
            if cfg.train.use_bf16:
                stack.enter_context(matmul_dtype(jnp.bfloat16))
            if cfg.train.weight_norm:
                stack.enter_context(weight_norm_reparam())
            yield
    return ctx
from detail_tts_tpu.train.losses import (discriminator_loss, feature_loss,
                                         generator_loss, kl_loss)
from detail_tts_tpu.train.optim import (make_d_optimizer, make_optimizer,
                                        trainable_mask_fn)

SINGLE_LOSS_TARGETS = ("vqvae", "gpt", "diff")
GAN_TARGETS = ("flowvae", "all")


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    vq_state: Any
    opt_state: Any
    d_params: Any = None
    d_opt_state: Any = None


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------


def dummy_batch(cfg: Config, batch_size: int = 1, mel_frames: int = 48,
                text_len: int = 8, raw_factor: int = 1) -> Dict[str, jnp.ndarray]:
    """A zero batch with the 12-key dataset contract (dataset_24k.py:258-272).

    ``raw_factor``: raw_* sequences are ``raw_factor * mel_frames`` long
    (the dataset keeps uncropped raw copies alongside 496-frame crops).
    """
    d = cfg.data
    b, t = batch_size, mel_frames
    t_raw = mel_frames * raw_factor
    assert t % 4 == 0 and t_raw % 4 == 0
    f32, i32 = jnp.float32, jnp.int32
    return {
        "spec": jnp.zeros((b, t, d.spec_channels), f32),
        "spec_length": jnp.full((b,), t, i32),
        "raw_spec": jnp.zeros((b, t_raw, d.spec_channels), f32),
        "raw_spec_length": jnp.full((b,), t_raw, i32),
        "mel": jnp.zeros((b, t, d.n_mel_channels), f32),
        "raw_mel": jnp.zeros((b, t_raw, d.n_mel_channels), f32),
        "wav": jnp.zeros((b, t * d.hop_length, 1), f32),
        "wav_length": jnp.full((b,), t * d.hop_length, i32),
        "raw_wav": jnp.zeros((b, t_raw * d.hop_length, 1), f32),
        "raw_wav_length": jnp.full((b,), t_raw * d.hop_length, i32),
        "text": jnp.zeros((b, text_len), i32),
        "text_length": jnp.full((b,), text_len, i32),
    }


def init_variables(model: SynthesizerTrn, cfg: Config, rng: jax.Array,
                   mel_frames: int = 48,
                   weight_norm: Optional[bool] = None) -> Dict[str, Any]:
    """Create every live param + the vq_state collection.

    ``weight_norm``: None follows cfg.train.weight_norm (training); pass
    False for the folded serving parameterization regardless of config.
    """
    if weight_norm is None:
        weight_norm = cfg.train.weight_norm
    mel_frames = max(mel_frames,
                     (cfg.train.segment_size // cfg.data.hop_length + 7) // 4 * 4)
    batch = dummy_batch(cfg, mel_frames=mel_frames)
    schedule = make_train_schedule(cfg)
    p_rng, d_rng, v_rng, m_rng = jax.random.split(rng, 4)
    # jit the init: eager flax init issues thousands of tiny device ops,
    # which is pathological over the axon TPU tunnel (~8 min vs seconds).
    # batch/schedule are closed over (DiffusionSchedule is not a pytree).
    # weight_norm_reparam is read at trace time, so it wraps the traced call
    # (init and every apply must agree on the parameterization).
    @jax.jit
    def init_fn(rngs, m_rng):
        with contextlib.ExitStack() as stack:
            if weight_norm:
                stack.enter_context(weight_norm_reparam())
            return model.init(rngs, batch, schedule, m_rng,
                              method=SynthesizerTrn.init_all)

    return init_fn({"params": p_rng, "dropout": d_rng, "vq": v_rng}, m_rng)


def make_train_state(cfg: Config, rng: jax.Array,
                     with_discriminator: Optional[bool] = None) -> Tuple[
                         TrainState, SynthesizerTrn, MultiPeriodDiscriminator]:
    """Build model(s), init variables and optimizer state."""
    target = cfg.train.target
    if with_discriminator is None:
        with_discriminator = target in GAN_TARGETS
    model = SynthesizerTrn(cfg)
    g_rng, d_rng = jax.random.split(rng)
    variables = init_variables(model, cfg, g_rng)
    params, vq_state = variables["params"], variables["vq_state"]

    tx = make_optimizer(cfg, target,
                        clip_norm=1.0 if target in SINGLE_LOSS_TARGETS else None)
    opt_state = tx.init(params)

    disc = MultiPeriodDiscriminator()
    d_params = d_opt_state = None
    if with_discriminator:
        seg = cfg.train.segment_size

        def d_init(rng, y, y_hat):
            with contextlib.ExitStack() as stack:
                if cfg.train.weight_norm:
                    stack.enter_context(weight_norm_reparam())
                return disc.init(rng, y, y_hat)

        d_vars = jax.jit(d_init)(d_rng, jnp.zeros((1, seg, 1)),
                                 jnp.zeros((1, seg, 1)))
        d_params = d_vars["params"]
        d_opt_state = make_d_optimizer(cfg).init(d_params)

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       vq_state=vq_state, opt_state=opt_state,
                       d_params=d_params, d_opt_state=d_opt_state)
    return state, model, disc


# ---------------------------------------------------------------------------
# Single-loss step (vqvae / gpt / diff)
# ---------------------------------------------------------------------------


def make_single_loss_step(model: SynthesizerTrn, cfg: Config,
                          donate: bool = True) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    ``batch`` leaves have shape (accum, micro_batch, ...): the leading axis
    is scanned (grad accumulation), the second is the device batch.
    """
    target = cfg.train.target
    tx = make_optimizer(cfg, target, clip_norm=1.0)
    schedule = make_train_schedule(cfg)
    amp = _amp_ctx_factory(cfg)

    def loss_fn(params, vq_state, batch, rng):
        with amp():
            return _loss_fn(params, vq_state, batch, rng)

    def _loss_fn(params, vq_state, batch, rng):
        variables = {"params": params, "vq_state": vq_state}
        new_vq = vq_state
        metrics = {}
        if target == "vqvae":
            (recon, commit), mut = model.apply(
                variables, batch["mel"], batch["spec_length"], train=True,
                method=SynthesizerTrn.forward_vq, mutable=["vq_state"],
                rngs={"vq": rng})
            new_vq = mut["vq_state"]
            loss = recon + 0.25 * commit  # model_24k.py:665
            metrics = {"loss_recon": recon, "loss_commit": commit}
        elif target == "gpt":
            loss_text, loss_mel = model.apply(
                variables, batch, deterministic=False,
                method=SynthesizerTrn.forward_gpt, rngs={"dropout": rng})
            loss = (cfg.train.text_weight * loss_text
                    + cfg.train.mel_weight * loss_mel)
            metrics = {"loss_text": loss_text, "loss_mel": loss_mel}
        elif target == "diff":
            d_rng, drop_rng = jax.random.split(rng)
            loss = model.apply(
                variables, batch, schedule, d_rng, deterministic=False,
                method=SynthesizerTrn.forward_diff, rngs={"dropout": drop_rng})
        else:
            raise ValueError(target)
        metrics["loss"] = loss
        return loss, (new_vq, metrics)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        accum = jax.tree_util.tree_leaves(batch)[0].shape[0]
        keys = jax.random.split(rng, accum)

        def micro(carry, xs):
            vq_state, grad_acc = carry
            mb, key = xs
            (_, (new_vq, metrics)), grads = grad_fn(state.params, vq_state,
                                                    mb, key)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return (new_vq, grad_acc), metrics

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (new_vq, grads), metrics = jax.lax.scan(
            micro, (state.vq_state, zero_grads), (batch, keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        metrics["grad_norm"] = optax.global_norm(
            _mask_tree(grads, target))

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  vq_state=new_vq, opt_state=new_opt)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _mask_tree(grads, target):
    mask = trainable_mask_fn(target)(grads)
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


# ---------------------------------------------------------------------------
# GAN step (flowvae / all)
# ---------------------------------------------------------------------------


def make_gan_step(model: SynthesizerTrn, disc: MultiPeriodDiscriminator,
                  cfg: Config, donate: bool = True) -> Callable:
    """Two-phase adversarial step (train.py:259-447).

    D update on (real slice, detached fake), then G update (LSGAN + feature
    matching + 45*mel L1 + KL [+ commit + diff + gpt under target='all'])
    against the updated D.
    """
    target = cfg.train.target
    hop = cfg.data.hop_length
    seg = cfg.train.segment_size
    seg_frames = seg // hop
    frontend = MelFrontend(cfg.data.sampling_rate, cfg.data.filter_length,
                           hop, cfg.data.win_length, cfg.data.n_mel_channels,
                           cfg.data.mel_fmin, cfg.data.mel_fmax)
    schedule = make_train_schedule(cfg)
    g_tx = make_optimizer(cfg, target, clip_norm=None)
    d_tx = make_d_optimizer(cfg)
    amp = _amp_ctx_factory(cfg)

    def g_forward(params, vq_state, batch, rng, need_aux=True):
        with amp():
            return _g_forward(params, vq_state, batch, rng, need_aux)

    def _g_forward(params, vq_state, batch, rng, need_aux=True):
        """Returns (FlowVAEOutputs, aux_losses, new_vq_state)."""
        variables = {"params": params, "vq_state": vq_state}
        f_rng, d_rng, drop_rng, vq_rng = jax.random.split(rng, 4)
        outs = model.apply(
            variables, batch["mel"], batch["spec"], batch["spec_length"],
            f_rng, deterministic=False, method=SynthesizerTrn.forward_flowvae,
            rngs={"dropout": drop_rng})
        aux = {"commit": jnp.asarray(0.0, jnp.float32),
               "diff": jnp.asarray(0.0, jnp.float32),
               "gpt": jnp.asarray(0.0, jnp.float32)}
        new_vq = vq_state
        if target == "all" and need_aux:  # model_24k.py:749-772
            loss_diff = model.apply(
                variables, batch, schedule, d_rng, deterministic=False,
                method=SynthesizerTrn.forward_diff, rngs={"dropout": drop_rng})
            loss_text, loss_mel_ce = model.apply(
                variables, batch, deterministic=False,
                method=SynthesizerTrn.forward_gpt, rngs={"dropout": drop_rng})
            (recon, commit), mut = model.apply(
                variables, batch["mel"], batch["spec_length"], train=True,
                method=SynthesizerTrn.forward_vq, mutable=["vq_state"],
                rngs={"vq": vq_rng})
            new_vq = mut["vq_state"]
            aux = {"commit": recon + 0.25 * commit,
                   "diff": loss_diff,
                   "gpt": (cfg.train.text_weight * loss_text
                           + cfg.train.mel_weight * loss_mel_ce)}
        return outs, aux, new_vq

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        g_rng, _ = jax.random.split(rng)

        # ---- phase 1: discriminator on detached fakes
        outs, _, _ = g_forward(state.params, state.vq_state, batch, g_rng,
                               need_aux=False)
        y_slice = slice_segments(batch["wav"], outs.ids_slice * hop, seg)
        y_hat_det = jax.lax.stop_gradient(outs.y_hat_slice)

        def d_loss_fn(d_params):
            with amp():
                d_r, d_g, _, _ = disc.apply({"params": d_params}, y_slice,
                                            y_hat_det)
            loss, _, _ = discriminator_loss(d_r, d_g)
            return loss

        loss_disc, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state,
                                           state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- phase 2: generator against the updated discriminator
        y_mel = slice_segments(batch["mel"], outs.ids_slice, seg_frames)

        def g_loss_fn(params):
            # identical rng -> identical slices/noise as phase 1
            outs2, aux, new_vq = g_forward(params, state.vq_state, batch, g_rng)
            y_hat_mel = frontend.mel_spectrogram(outs2.y_hat_slice[..., 0])
            # pad/trim to the sliced gt mel frame count
            y_hat_mel = y_hat_mel[:, :seg_frames]
            with amp():
                _, d_g, fmap_r, fmap_g = disc.apply(
                    {"params": new_d_params}, y_slice, outs2.y_hat_slice)
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * cfg.train.c_mel
            loss_kl = kl_loss(outs2.z_p, outs2.logs_q, outs2.m_p, outs2.logs_p,
                              outs2.y_mask) * cfg.train.c_kl
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, _ = generator_loss(d_g)
            total = (loss_gen + loss_fm + loss_mel + loss_kl
                     + aux["commit"] + aux["diff"] + aux["gpt"])
            metrics = {"loss_gen_all": total, "loss_gen": loss_gen,
                       "loss_fm": loss_fm, "loss_mel": loss_mel,
                       "loss_kl": loss_kl, "loss_commit": aux["commit"],
                       "loss_diff": aux["diff"], "loss_gpt": aux["gpt"]}
            return total, (new_vq, metrics)

        (_, (new_vq, metrics)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params)
        g_grads = _mask_tree(g_grads, target)
        metrics["loss_disc_all"] = loss_disc
        metrics["grad_norm_g"] = optax.global_norm(g_grads)
        metrics["grad_norm_d"] = optax.global_norm(d_grads)

        g_updates, new_g_opt = g_tx.update(g_grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, g_updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  vq_state=new_vq, opt_state=new_g_opt,
                                  d_params=new_d_params,
                                  d_opt_state=new_d_opt)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step(model: SynthesizerTrn, disc: MultiPeriodDiscriminator,
                    cfg: Config, donate: bool = True) -> Callable:
    """Dispatch on cfg.train.target (model_24k.py:738-748)."""
    if cfg.train.target in SINGLE_LOSS_TARGETS:
        return make_single_loss_step(model, cfg, donate=donate)
    return make_gan_step(model, disc, cfg, donate=donate)


def stack_microbatches(batch: Dict[str, jax.Array], accum: int
                       ) -> Dict[str, jax.Array]:
    """(accum*micro, ...) -> (accum, micro, ...) for the scan axis."""
    def reshape(x):
        return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

    return jax.tree_util.tree_map(reshape, batch)
