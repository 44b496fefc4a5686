"""TrainConfig.rng_impl: the TPU-hardware RngBitGenerator step key.

The round-4 kernel census (CLAUDE.md "Performance state") showed jax's
portable threefry2x32 dropout-mask arithmetic fused into the attention
einsums carrying ~46% of the gpt train step; ``rng_impl='rbg'`` (the
default) switches the *step-loop* key to the hardware RngBitGenerator.
These tests pin the contract:

* a train step runs and produces finite losses under an 'rbg' typed key
  exactly as under the classic threefry uint32 key;
* param init is rng_impl-INDEPENDENT (always threefry, trainer.py:134-138)
  so checkpoints are comparable across the knob;
* the trainer's step key honors the configured impl.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.train.step import (dummy_batch, make_train_state,
                                       make_train_step, stack_microbatches)

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def _tiny_cfg(target="gpt", rng_impl="rbg"):
    cfg = small_test_config()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, target=target,
                                       rng_impl=rng_impl))


@pytest.mark.parametrize("target", ["gpt", "diff"])
def test_step_runs_under_rbg_key(target):
    cfg = _tiny_cfg(target)
    state, model, disc = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, disc, cfg, donate=False)
    batch = stack_microbatches(dummy_batch(cfg, 2, 48, 8), accum=2)
    key = jax.random.key(7, impl=cfg.train.rng_impl)
    new_state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_param_init_independent_of_rng_impl():
    s_rbg, _, _ = make_train_state(_tiny_cfg(rng_impl="rbg"),
                                   jax.random.PRNGKey(3))
    s_tf, _, _ = make_train_state(_tiny_cfg(rng_impl="threefry2x32"),
                                  jax.random.PRNGKey(3))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_rbg.params, s_tf.params)


@pytest.mark.parametrize("impl", ["rbg", "threefry2x32"])
def test_trainer_step_key_impl(tmp_path, impl):
    from detail_tts_tpu.train.trainer import Trainer
    cfg = _tiny_cfg(rng_impl=impl)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, train_steps=1,
                                       save_freq=10, val_freq=10))
    tr = Trainer(cfg, data_iter=None, logs_folder=str(tmp_path))
    assert impl in str(jax.random.key_impl(tr._rng)).lower()
    # splitting + consuming the key works end to end
    k1, k2 = jax.random.split(tr._rng)
    x = jax.random.uniform(k2, (4,))
    assert np.all(np.isfinite(np.asarray(x)))
