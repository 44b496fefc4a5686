"""Optimizers, LR schedule, and per-target trainable-parameter masks.

Reference: train.py:123-131 (AdamW x2, torch defaults incl. weight decay
0.01), train.py:455-457 (ExponentialLR gamma=0.999875 stepped every 50k
steps -> staircase schedule), model_24k.py:620-651 (per-target freezing via
``requires_grad_``).
"""
from __future__ import annotations

from typing import Any, Callable, Set

import jax
import optax

from detail_tts_tpu.config import Config

# Top-level synthesizer param-tree keys trained per target
# (model_24k.py:620-651; 'all' trains everything).
_VQ_KEYS = ("quantizer", "vq_enc_norm", "vq_enc_conv0", "vq_enc_conv1",
            "vq_enc_conv2", "vq_dec_norm", "vq_dec_up0", "vq_dec_up1",
            "vq_dec_conv", "vq_ref_enc")
_FLOWVAE_KEYS = ("dec", "in_proj", "enc_p", "enc_q", "flow", "ref_enc")

TARGET_TRAINABLE = {
    "vqvae": set(_VQ_KEYS),
    "gpt": {"gpt"},
    "diff": {"diffusion"},
    "flowvae": set(_FLOWVAE_KEYS),
    "all": None,  # everything
}


def trainable_mask_fn(target: str) -> Callable[[Any], Any]:
    """Returns params -> bool pytree selecting the target's trainable subtree."""
    keys: Set[str] | None = TARGET_TRAINABLE[target]

    def fn(params):
        def mark(path, _):
            if keys is None:
                return True
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return top in keys

        return jax.tree_util.tree_map_with_path(mark, params)

    return fn


def _label_fn(target: str) -> Callable[[Any], Any]:
    mask = trainable_mask_fn(target)

    def fn(params):
        return jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", mask(params))

    return fn


def lr_schedule(cfg: Config) -> optax.Schedule:
    """base * gamma^(step // 50k): staircase exponential decay."""
    return optax.exponential_decay(
        init_value=cfg.train.learning_rate,
        transition_steps=cfg.train.lr_decay_every,
        decay_rate=cfg.train.lr_decay,
        staircase=True,
    )


def make_optimizer(cfg: Config, target: str,
                   clip_norm: float | None = 1.0) -> optax.GradientTransformation:
    """Masked AdamW for the generator-side stage.

    ``clip_norm=1.0`` matches the reference single-loss path
    (train.py:223); pass ``None`` for the GAN path (the reference's
    ``clip_grad_value_(..., None)`` is a no-op there).
    """
    steps = [
        optax.adamw(lr_schedule(cfg), b1=cfg.train.betas[0],
                    b2=cfg.train.betas[1], eps=cfg.train.eps,
                    weight_decay=0.01),
    ]
    if clip_norm is not None:
        steps.insert(0, optax.clip_by_global_norm(clip_norm))
    tx = optax.chain(*steps)
    if TARGET_TRAINABLE[target] is not None:
        # frozen leaves must get *zero* updates (optax.masked would pass raw
        # gradients through for masked-out leaves)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                   _label_fn(target))
    return tx


def make_d_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW for the discriminator (train.py:124, no grad clipping)."""
    return optax.adamw(lr_schedule(cfg), b1=cfg.train.betas[0],
                       b2=cfg.train.betas[1], eps=cfg.train.eps,
                       weight_decay=0.01)
