"""Behavioral coverage of the three diffusion samplers (SURVEY M7/M8).

The live reference path is 50-step ancestral with ramped CFG
(model_24k.py:489); DDIM and DPM++(2M) are its alternates (configured
sampler, model_24k.py:583).  These tests run all three on a known analytic
model (eps-prediction of a fixed target) and pin: shapes, finiteness,
DDIM determinism, and that every sampler drives the sample toward the
model's implied data mode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.models.diffusion import (ddim_sample_loop,
                                             dpmpp_2m_sample_loop,
                                             p_sample_loop)
from detail_tts_tpu.models.synthesizer import make_infer_schedule

pytestmark = pytest.mark.smoke  # <5-min tier (pytest.ini); slow outliers opt out below

TARGET = 0.7  # the analytic model's data mode


def _schedule():
    return make_infer_schedule(small_test_config())


def _model_fn(schedule):
    """eps-prediction model whose x0-estimate is always TARGET.

    eps = (x_t - sqrt(acp_t) * TARGET) / sqrt(1 - acp_t) makes every
    posterior step contract toward TARGET; variance head predicts
    min-log-variance (v = -1 in the learned-range parametrization).
    """
    acp = schedule.alphas_cumprod
    t_map = np.asarray(schedule.timestep_map)

    def fn(x, t_orig, conditioning_free=None):
        # map original timesteps back to spaced indices
        t = jnp.searchsorted(jnp.asarray(t_map), t_orig)
        a = acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
        eps = (x - jnp.sqrt(a) * TARGET) / jnp.sqrt(1.0 - a)
        var = -jnp.ones_like(x)
        return eps, var

    return fn


@pytest.mark.parametrize("name", ["ancestral", "ddim", "dpmpp_2m_karras",
                                  "dpmpp_2m"])
def test_sampler_contracts_to_target(name):
    schedule = _schedule()
    fn = _model_fn(schedule)
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 8), jnp.float32)
    if name == "ancestral":
        out = p_sample_loop(schedule, fn, noise, jax.random.PRNGKey(1),
                            cond_free_k=2.0, conditioning_free=False)
    elif name == "ddim":
        out = ddim_sample_loop(schedule, fn, noise)
    elif name == "dpmpp_2m_karras":
        out = dpmpp_2m_sample_loop(schedule, fn, noise,
                                   conditioning_free=False)
    else:
        # reference dpm++2m runs on its own CONTINUOUS linear VP schedule
        # and calls the model at t*1000 floats: the analytic eps model must
        # use that schedule's alpha/sigma (NoiseScheduleVP 'linear')
        b0, b1 = 0.1 / 4, 20.0 / 4

        def cont_fn(x, t_model, conditioning_free=None):
            t = t_model.astype(jnp.float32) / 1000.0
            log_a = -0.25 * t**2 * (b1 - b0) - 0.5 * t * b0
            a = jnp.exp(log_a).reshape((-1,) + (1,) * (x.ndim - 1))
            s = jnp.sqrt(1.0 - a**2)
            eps = (x - a * TARGET) / s
            return eps, -jnp.ones_like(x)

        from detail_tts_tpu.models.diffusion import (
            dpmpp_2m_reference_sample_loop)

        out = dpmpp_2m_reference_sample_loop(
            cont_fn, noise, steps=schedule.num_timesteps,
            guidance_scale=2.0)
    out = np.asarray(out)
    assert out.shape == noise.shape
    assert np.isfinite(out).all()
    # all samplers must land near the analytic data mode
    assert abs(float(out.mean()) - TARGET) < 0.15, float(out.mean())
    assert float(np.abs(out - TARGET).mean()) < 0.3


def test_ddim_deterministic():
    schedule = _schedule()
    fn = _model_fn(schedule)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 4), jnp.float32)
    a = np.asarray(ddim_sample_loop(schedule, fn, noise))
    b = np.asarray(ddim_sample_loop(schedule, fn, noise))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # ~2-4 min: builds a serving engine / jits the extraction program
def test_engine_sampler_selection():
    """EngineConfig.diffusion_sampler switches the serving diffuse path."""
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    cfg = small_test_config()
    base = dict(max_generate_length=8, text_buckets=(16,),
                prompt_buckets=(32,), code_buckets=(8,))
    eng = random_engine(cfg, engine_cfg=EngineConfig(
        diffusion_sampler="dpmpp_2m", **base))
    sr = cfg.data.sampling_rate
    wav = np.random.default_rng(0).uniform(-0.3, 0.3, sr).astype(np.float32)
    out = eng.synthesize_batch(["ni3 hao3"], [wav],
                               rng=jax.random.PRNGKey(0), force_full=True)
    assert out[0].ndim == 1 and np.isfinite(out[0]).all()
    with pytest.raises(ValueError):
        bad = random_engine(cfg, engine_cfg=EngineConfig(
            diffusion_sampler="nope", **base))
        bad.synthesize_batch(["a"], [wav], rng=jax.random.PRNGKey(0))


@pytest.mark.slow  # ~2-4 min: builds a serving engine / jits the extraction program
def test_engine_diffusion_steps_override():
    """EngineConfig.diffusion_steps shrinks the serving schedule only."""
    from detail_tts_tpu.serving.pipeline import EngineConfig, random_engine

    cfg = small_test_config()
    eng = random_engine(cfg, engine_cfg=EngineConfig(
        max_generate_length=8, text_buckets=(16,), prompt_buckets=(32,),
        code_buckets=(8,), diffusion_steps=3))
    assert eng.schedule.num_timesteps == 3
    assert eng.cfg.diffusion.infer_steps == cfg.diffusion.infer_steps
    sr = cfg.data.sampling_rate
    wav = np.random.default_rng(1).uniform(-0.3, 0.3, sr).astype(np.float32)
    out = eng.synthesize_batch(["ni3 hao3"], [wav],
                               rng=jax.random.PRNGKey(0), force_full=True)
    assert np.isfinite(out[0]).all()
