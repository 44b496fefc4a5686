"""Train-step tests: staged losses, trainable-subtree freezing, GAN phases.

Runs on the 8-device virtual CPU mesh (conftest.py) with the small config.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.train.optim import TARGET_TRAINABLE
from detail_tts_tpu.train.step import (dummy_batch, make_train_state,
                                       make_train_step, stack_microbatches)

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def random_batch(cfg, rng, batch_size=2, mel_frames=48, text_len=8):
    batch = dummy_batch(cfg, batch_size, mel_frames, text_len)
    keys = jax.random.split(rng, 4)
    batch["mel"] = jax.random.normal(keys[0], batch["mel"].shape) * 2 - 6
    batch["raw_mel"] = batch["mel"]
    batch["spec"] = jnp.abs(jax.random.normal(keys[1], batch["spec"].shape))
    batch["raw_spec"] = batch["spec"]
    batch["wav"] = jax.random.uniform(keys[2], batch["wav"].shape, minval=-0.5,
                                      maxval=0.5)
    batch["raw_wav"] = batch["wav"]
    batch["text"] = jax.random.randint(keys[3], batch["text"].shape, 3, 40)
    return batch


def _changed_topkeys(before, after):
    changed = set()
    for k in before:
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), before[k], after[k])
        if any(v > 0 for v in jax.tree_util.tree_leaves(diff)):
            changed.add(k)
    return changed


@pytest.mark.parametrize("target", ["vqvae", "gpt", "diff"])
def test_single_loss_step(target):
    cfg = small_test_config()
    cfg = cfg.replace(train=cfg.train.replace_target(target)) if hasattr(
        cfg.train, "replace_target") else cfg
    import dataclasses
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             target=target))
    rng = jax.random.PRNGKey(0)
    state, model, disc = make_train_state(cfg, rng)
    step = make_train_step(model, disc, cfg, donate=False)

    batch = random_batch(cfg, jax.random.PRNGKey(1), batch_size=4)
    batch = stack_microbatches(batch, accum=2)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))

    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    changed = _changed_topkeys(state.params, new_state.params)
    allowed = TARGET_TRAINABLE[target]
    assert changed, f"no params changed for target={target}"
    assert changed <= allowed, f"frozen params changed: {changed - allowed}"


def test_vq_state_updates_only_for_vq_targets():
    import dataclasses
    cfg = small_test_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             target="vqvae"))
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)
    batch = stack_microbatches(
        random_batch(cfg, jax.random.PRNGKey(1), batch_size=4), accum=2)
    new_state, _ = step(state, batch, jax.random.PRNGKey(2))

    inited = jax.tree_util.tree_leaves(
        new_state.vq_state)  # k-means init must have run
    old_embed = state.vq_state["quantizer"]["layer_0"]["codebook"]["embed"]
    new_embed = new_state.vq_state["quantizer"]["layer_0"]["codebook"]["embed"]
    assert float(jnp.max(jnp.abs(new_embed - old_embed))) > 0


def test_gan_step_flowvae():
    import dataclasses
    cfg = small_test_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             target="flowvae"))
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)
    batch = random_batch(cfg, jax.random.PRNGKey(1), batch_size=2)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))

    for k in ("loss_gen_all", "loss_disc_all", "loss_mel", "loss_kl"):
        assert np.isfinite(float(metrics[k])), k
    changed = _changedtop = _changed_topkeys(state.params, new_state.params)
    assert changed <= TARGET_TRAINABLE["flowvae"], changed
    d_changed = _changed_topkeys(state.d_params, new_state.d_params)
    assert d_changed, "discriminator did not update"


def test_gan_step_all_joint_target():
    """target='all' (model_24k.py:749-772): every loss component finite,
    vq_state EMA advances, generator AND discriminator subtrees update."""
    import dataclasses
    cfg = small_test_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             target="all"))
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)
    batch = random_batch(cfg, jax.random.PRNGKey(1), batch_size=2)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))

    for k in ("loss_gen_all", "loss_disc_all", "loss_gen", "loss_fm",
              "loss_mel", "loss_kl", "loss_commit", "loss_diff", "loss_gpt",
              "grad_norm_g"):
        assert np.isfinite(float(metrics[k])), k
    # aux losses are real (non-zero) under 'all', unlike 'flowvae'
    for k in ("loss_commit", "loss_diff", "loss_gpt"):
        assert float(metrics[k]) != 0.0, k

    changed = _changed_topkeys(state.params, new_state.params)
    # joint target trains gpt + diffusion + vq + flow-vae/vocoder subtrees
    for key in ("gpt", "diffusion", "vq_enc_conv0", "flow", "dec", "enc_q"):
        assert key in changed, f"{key} did not update under target='all'"
    d_changed = _changed_topkeys(state.d_params, new_state.d_params)
    assert d_changed, "discriminator did not update"

    old_embed = state.vq_state["quantizer"]["layer_0"]["codebook"]["embed"]
    new_embed = new_state.vq_state["quantizer"]["layer_0"]["codebook"]["embed"]
    assert float(jnp.max(jnp.abs(new_embed - old_embed))) > 0
