"""Numerical parity vs the reference PyTorch model (converted weights).

The reference model is instantiated with random weights, converted with
io/torch_convert, and both frameworks are driven with identical inputs.
These are the strongest correctness tests in the suite: they exercise the
exact math of every live submodule at full reference size (short sequences).
"""
import numpy as np
import pytest

pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import torch

from detail_tts_tpu.config import Config
from detail_tts_tpu.io.torch_convert import convert_state_dict
from detail_tts_tpu.models.synthesizer import SynthesizerTrn
from detail_tts_tpu.train.step import init_variables
from tests.ref_loader import load_reference_synthesizer

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


@pytest.fixture(scope="module")
def ref_and_jax():
    G, _ = load_reference_synthesizer()
    cfg = Config()
    model = SynthesizerTrn(cfg)
    template = init_variables(model, cfg, jax.random.PRNGKey(0), weight_norm=False)
    variables, report = convert_state_dict(G.state_dict(), template)
    assert not report["unmapped"], report["unmapped"][:10]
    assert not report["missing"], report["missing"][:10]
    assert not report["unconsumed"], report["unconsumed"][:10]
    return G, model, variables, cfg


def _np(x):
    return x.detach().cpu().numpy()


def test_vq_roundtrip_parity(ref_and_jax):
    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(0)
    b, t = 2, 64
    mel = rng.normal(-6.0, 2.0, (b, 128, t)).astype(np.float32)
    lengths = np.array([t, t - 16], np.int64)

    with torch.no_grad():
        y = torch.from_numpy(mel)
        mask = torch.zeros(b, 1, t)
        for i, l in enumerate(lengths):
            mask[i, :, :l] = 1
        x_vq = G.vq_enc(y)
        quantized, codes, _, _ = G.quantizer(x_vq, layers=[0])
        g_vq = G.vq_ref_enc(y * mask, mask)
        recon_ref = _np(G.vq_dec(quantized + g_vq))
        codes_ref = _np(codes[0])

    mel_j = jnp.asarray(mel.transpose(0, 2, 1))
    feats = model.apply(variables, mel_j,
                        method=SynthesizerTrn.vq_encode_features)
    codes_j, _ = model.apply(variables, mel_j, method=SynthesizerTrn.encode)
    q = model.apply(variables, codes_j[None],
                    method=lambda m, c: m.quantizer.decode(c))
    from detail_tts_tpu.nn.common import sequence_mask

    def style_plus_decode(m, mel_in, q_in, lens):
        msk = sequence_mask(lens, mel_in.shape[1])[..., None]
        g = m.vq_ref_enc(mel_in * msk, msk[..., 0])
        return m.vq_decode_features(q_in + g[:, None, :])

    recon_j = model.apply(variables, mel_j, q, jnp.asarray(lengths, jnp.int32),
                          method=style_plus_decode)

    np.testing.assert_array_equal(codes_ref, np.asarray(codes_j))
    np.testing.assert_allclose(recon_ref.transpose(0, 2, 1),
                               np.asarray(recon_j), atol=2e-4, rtol=1e-3)


def test_gpt_forward_parity(ref_and_jax):
    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(1)
    b, t_cond, t_text, t_code = 2, 48, 10, 16
    cond = rng.normal(-6, 2, (b, 128, t_cond)).astype(np.float32)
    cond_len = np.array([t_cond, t_cond - 8], np.int64)
    text = rng.integers(3, 200, (b, t_text)).astype(np.int64)
    codes = rng.integers(0, 8192, (b, t_code)).astype(np.int64)
    wav_len = np.array([t_code * 1024, (t_code - 4) * 1024], np.int64)

    with torch.no_grad():
        lt_ref, lm_ref, logits_ref = G.gpt(
            torch.from_numpy(cond), torch.from_numpy(cond_len),
            torch.from_numpy(text), torch.from_numpy(np.array([t_text] * b)),
            torch.from_numpy(codes.copy()), torch.from_numpy(wav_len))
        latents_ref = G.gpt(
            torch.from_numpy(cond), torch.from_numpy(cond_len),
            torch.from_numpy(text), torch.from_numpy(np.array([t_text] * b)),
            torch.from_numpy(codes.copy()), torch.from_numpy(wav_len),
            return_latent=True)

    from detail_tts_tpu.models.gpt import UnifiedVoice

    gpt_module = UnifiedVoice(cfg.gpt)
    gpt_vars = {"params": variables["params"]["gpt"]}
    lt_j, lm_j, logits_j = gpt_module.apply(
        gpt_vars, jnp.asarray(cond.transpose(0, 2, 1)),
        jnp.asarray(cond_len, jnp.int32), jnp.asarray(text, jnp.int32), None,
        jnp.asarray(codes, jnp.int32), jnp.asarray(wav_len, jnp.int32),
        deterministic=True)
    latents_j = gpt_module.apply(
        gpt_vars, jnp.asarray(cond.transpose(0, 2, 1)),
        jnp.asarray(cond_len, jnp.int32), jnp.asarray(text, jnp.int32), None,
        jnp.asarray(codes, jnp.int32), jnp.asarray(wav_len, jnp.int32),
        return_latent=True, deterministic=True)

    np.testing.assert_allclose(float(lt_ref), float(lt_j), rtol=2e-3)
    np.testing.assert_allclose(float(lm_ref), float(lm_j), rtol=2e-3)
    np.testing.assert_allclose(_np(latents_ref), np.asarray(latents_j),
                               atol=2e-3, rtol=1e-2)
    # logits: ref (B, V, T) vs mine (B, T, V)
    np.testing.assert_allclose(_np(logits_ref).transpose(0, 2, 1),
                               np.asarray(logits_j), atol=3e-3, rtol=1e-2)


def test_flowvae_parity(ref_and_jax):
    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(2)
    b, t = 2, 40
    mel = rng.normal(-6, 2, (b, 128, t)).astype(np.float32)
    spec = np.abs(rng.normal(0, 1, (b, 513, t))).astype(np.float32)
    lengths = np.array([t, t - 8], np.int64)
    z = rng.normal(0, 1, (b, 192, t)).astype(np.float32)

    with torch.no_grad():
        y = torch.from_numpy(mel)
        mask = torch.zeros(b, 1, t)
        for i, l in enumerate(lengths):
            mask[i, :, :l] = 1
        g_ref = G.ref_enc(y * mask, mask)
        x = G.in_proj(y)
        _, m_p_ref, logs_p_ref = G.enc_p(x, torch.from_numpy(lengths))
        _, m_q_ref, logs_q_ref = G.enc_q(torch.from_numpy(spec),
                                         torch.from_numpy(lengths), g_ref)
        z_p_ref = _np(G.flow(torch.from_numpy(z), mask, g=g_ref))
        wav_ref = _np(G.dec(torch.from_numpy(z), g=g_ref))

    from detail_tts_tpu.nn.common import sequence_mask

    mel_j = jnp.asarray(mel.transpose(0, 2, 1))
    lens_j = jnp.asarray(lengths, jnp.int32)

    def run(m, mel_in, spec_in, z_in, lens):
        msk = sequence_mask(lens, mel_in.shape[1])[..., None]
        g = m.ref_enc(mel_in * msk, msk[..., 0])
        x = m.in_proj(mel_in)
        _, m_p, logs_p = m.enc_p(x, lens)
        x_q = m.enc_q(spec_in, lens, None, g=g) if False else None
        z_p = m.flow(z_in, msk, g=g)
        wav = m.dec(z_in, g=g)
        return g, m_p, logs_p, z_p, wav

    g_j, m_p_j, logs_p_j, z_p_j, wav_j = model.apply(
        variables, mel_j, jnp.asarray(spec.transpose(0, 2, 1)),
        jnp.asarray(z.transpose(0, 2, 1)), lens_j, method=run)

    np.testing.assert_allclose(_np(g_ref)[:, :, 0], np.asarray(g_j),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(_np(m_p_ref).transpose(0, 2, 1),
                               np.asarray(m_p_j), atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(_np(logs_p_ref).transpose(0, 2, 1),
                               np.asarray(logs_p_j), atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(z_p_ref.transpose(0, 2, 1), np.asarray(z_p_j),
                               atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(wav_ref.transpose(0, 2, 1), np.asarray(wav_j),
                               atol=2e-3, rtol=1e-2)

    # posterior encoder stats (z itself is sampled -> compare m/logs only)
    with torch.no_grad():
        pass

    def run_q(m, spec_in, lens, g):
        z_out, m_q, logs_q = m.enc_q(spec_in, lens,
                                     jax.random.PRNGKey(0), g=g)
        return m_q, logs_q

    m_q_j, logs_q_j = model.apply(
        variables, jnp.asarray(spec.transpose(0, 2, 1)), lens_j, g_j,
        method=run_q)
    np.testing.assert_allclose(_np(m_q_ref).transpose(0, 2, 1),
                               np.asarray(m_q_j), atol=5e-4, rtol=1e-2)
    np.testing.assert_allclose(_np(logs_q_ref).transpose(0, 2, 1),
                               np.asarray(logs_q_j), atol=5e-4, rtol=1e-2)


def test_diffusion_parity(ref_and_jax):
    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(3)
    b, t_code = 1, 12
    t_mel = t_code * 4
    x = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    t = np.array([17], np.int64)

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        # reference takes (B, T, C) float latents and permutes internally
        out_ref = _np(G.diffusion(
            torch.from_numpy(x), torch.from_numpy(t),
            aligned_conditioning=torch.from_numpy(latents),
            conditioning_latent=cond_ref))

    def run(m, x_in, t_in, lat, ref_in):
        cond = m.diffusion.get_conditioning(ref_in)
        return cond, m.diffusion(x_in, t_in, aligned_latent=lat,
                                 conditioning_latent=cond)

    cond_j, out_j = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(latents), jnp.asarray(refer.transpose(0, 2, 1)),
        method=run)

    np.testing.assert_allclose(_np(cond_ref), np.asarray(cond_j),
                               atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(out_ref.transpose(0, 2, 1), np.asarray(out_j),
                               atol=2e-3, rtol=1e-2)


def test_full_checkpoint_convert_and_msgpack_roundtrip(ref_and_jax, tmp_path):
    """torch.save dict -> load_torch_checkpoint -> msgpack -> restore."""
    import torch

    from detail_tts_tpu.io.torch_convert import load_torch_checkpoint
    from detail_tts_tpu.train.checkpoint import restore_variables

    G, model, variables, cfg = ref_and_jax
    ckpt = str(tmp_path / "model-1.pt")
    # the reference trainer's checkpoint layout (train.py:139-150)
    torch.save({"step": 1000, "epoch": 1, "G": G.state_dict(), "D": {},
                "G_opt": {}, "D_opt": {}}, ckpt)
    msgpack = str(tmp_path / "weights.msgpack")
    loaded = load_torch_checkpoint(ckpt, cfg, save_msgpack=msgpack)

    a = loaded["params"]["gpt"]["mel_head"]["dense"]["kernel"]
    b = variables["params"]["gpt"]["mel_head"]["dense"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    restored = restore_variables(msgpack, cfg)
    c = restored["params"]["gpt"]["mel_head"]["dense"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    cb = restored["vq_state"]["quantizer"]["layer_0"]["codebook"]["embed"]
    np.testing.assert_array_equal(
        np.asarray(cb),
        np.asarray(variables["vq_state"]["quantizer"]["layer_0"]["codebook"]["embed"]))


def test_ddim_sampler_loop_parity(ref_and_jax):
    """End-to-end DETERMINISTIC sampler parity: the reference's 50-step
    SpacedDiffusion.ddim_sample_loop (conditioning_free + ramped k,
    model_24k.py:581-583) vs our ddim_sample_loop driving the SERVING
    model_fn (precomputed code embedding + CFG 2B batched call + hoisted
    log2-domain biases) from the same converted weights and noise.

    Pins the schedule spacing, CFG ramp, learned-range variance math and
    the cfg_call dedup wiring in one shot (eta=0 removes all randomness).
    """
    from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
    from detail_tts_tpu.models.diffusion import ddim_sample_loop
    from detail_tts_tpu.models.synthesizer import make_infer_schedule

    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(11)
    b, t_code = 1, 6
    t_mel = t_code * FRAMES_PER_CODE
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    noise = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        out_ref = _np(G.infer_diffuser.ddim_sample_loop(
            G.diffusion, (b, 128, t_mel), noise=torch.from_numpy(noise),
            model_kwargs={"aligned_conditioning": torch.from_numpy(latents),
                          "conditioning_latent": cond_ref}))

    schedule = make_infer_schedule(cfg)

    def run(m):
        cond = m.diffusion_conditioning(jnp.asarray(refer.transpose(0, 2, 1)))
        code_emb = m.diffusion_code_embedding(jnp.asarray(latents), cond)
        biases = m.diffusion_attention_biases(t_mel)

        def model_fn(x, t_orig, conditioning_free):
            if x.shape[0] == 2 * b:
                return m.diffusion_cfg_step(x, t_orig, code_emb, biases)
            cf = (jnp.zeros((x.shape[0],), bool) if conditioning_free is None
                  else conditioning_free)
            return m.diffusion_step(x, t_orig, code_emb, cf, biases)

        return ddim_sample_loop(
            schedule, model_fn, jnp.asarray(noise.transpose(0, 2, 1)),
            cond_free_k=cfg.diffusion.cond_free_k, conditioning_free=True)

    out_j = np.asarray(model.apply(variables, method=run))
    np.testing.assert_allclose(out_ref.transpose(0, 2, 1), out_j,
                               atol=5e-3, rtol=1e-2)


def test_ancestral_sampler_loop_parity(ref_and_jax):
    """Matched-noise ANCESTRAL loop parity: the LIVE serving path
    (model_24k.py:489 calls p_sample_loop; diffusion.py:654-707) injects
    noise scaled by exp(0.5*logvar) from the LEARNED-RANGE variance head —
    the one piece of live inference math the deterministic DDIM test never
    exercises.  Pre-generate the per-step noises, feed the identical
    sequence to the reference ``p_sample`` (via a torch.randn_like patch)
    and to our ``p_sample_loop(noise_seq=...)``, and compare the final mel.
    """
    from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
    from detail_tts_tpu.models.diffusion import p_sample_loop
    from detail_tts_tpu.models.synthesizer import make_infer_schedule

    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(17)
    b, t_code = 1, 6
    t_mel = t_code * FRAMES_PER_CODE
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    noise = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)
    n_steps = cfg.diffusion.infer_steps
    # one injection noise per step, consumed highest-timestep first (the
    # reference draws randn_like once per p_sample, diffusion.py:480)
    step_noises = rng.normal(0, 1, (n_steps, b, 128, t_mel)).astype(np.float32)

    consumed = []

    def fake_randn_like(x, **kw):
        assert tuple(x.shape) == (b, 128, t_mel)
        consumed.append(None)
        return torch.from_numpy(step_noises[len(consumed) - 1])

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        orig = torch.randn_like
        torch.randn_like = fake_randn_like
        try:
            out_ref = _np(G.infer_diffuser.p_sample_loop(
                G.diffusion, (b, 128, t_mel), noise=torch.from_numpy(noise),
                model_kwargs={"aligned_conditioning": torch.from_numpy(latents),
                              "conditioning_latent": cond_ref}))
        finally:
            torch.randn_like = orig
    assert len(consumed) == n_steps

    schedule = make_infer_schedule(cfg)

    def run(m):
        cond = m.diffusion_conditioning(jnp.asarray(refer.transpose(0, 2, 1)))
        code_emb = m.diffusion_code_embedding(jnp.asarray(latents), cond)
        biases = m.diffusion_attention_biases(t_mel)

        def model_fn(x, t_orig, conditioning_free):
            if x.shape[0] == 2 * b:
                return m.diffusion_cfg_step(x, t_orig, code_emb, biases)
            cf = (jnp.zeros((x.shape[0],), bool) if conditioning_free is None
                  else conditioning_free)
            return m.diffusion_step(x, t_orig, code_emb, cf, biases)

        return p_sample_loop(
            schedule, model_fn, jnp.asarray(noise.transpose(0, 2, 1)),
            jax.random.PRNGKey(0), cond_free_k=cfg.diffusion.cond_free_k,
            conditioning_free=True,
            noise_seq=jnp.asarray(step_noises.transpose(0, 1, 3, 2)))

    out_j = np.asarray(model.apply(variables, method=run))
    l1 = float(np.mean(np.abs(out_ref.transpose(0, 2, 1) - out_j)))
    print(f"matched-noise ancestral loop mel L1 vs reference: {l1:.6f}")
    assert l1 <= 1e-2, l1
    np.testing.assert_allclose(out_ref.transpose(0, 2, 1), out_j,
                               atol=5e-3, rtol=1e-2)


def test_diffusion_training_losses_parity(ref_and_jax):
    """Reference ``SpacedDiffusion.training_losses`` (MSE + VB with frozen
    mean, diffusion.py:930-1014) vs models/diffusion.py::training_losses on
    matched (x_start, t, noise) through the SAME converted diffusion model —
    including the t==0 discretized-Gaussian NLL branch."""
    from detail_tts_tpu.models.diffusion import training_losses
    from detail_tts_tpu.models.synthesizer import make_train_schedule

    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(19)
    b, t_code = 3, 6
    t_mel = t_code * 4
    x_start = np.tanh(rng.normal(0, 0.7, (b, 128, t_mel))).astype(np.float32)
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    noise = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)
    # spaced indices incl. the t==0 NLL branch and the last step
    t = np.array([0, 57, cfg.diffusion.train_sample_steps - 1], np.int64)

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        terms = G.diffuser.training_losses(
            G.diffusion, torch.from_numpy(x_start), torch.from_numpy(t),
            model_kwargs={"aligned_conditioning": torch.from_numpy(latents),
                          "conditioning_latent": cond_ref},
            noise=torch.from_numpy(noise))

    schedule = make_train_schedule(cfg)

    def run(m):
        cond = m.diffusion_conditioning(jnp.asarray(refer.transpose(0, 2, 1)))
        x_start_j = jnp.asarray(x_start.transpose(0, 2, 1))
        noise_j = jnp.asarray(noise.transpose(0, 2, 1))
        t_j = jnp.asarray(t, jnp.int32)
        x_t = schedule.q_sample(x_start_j, t_j, noise_j)
        out = m.diffusion(x_t, schedule.timestep_map[t_j],
                          aligned_latent=jnp.asarray(latents),
                          conditioning_latent=cond)
        eps, var_logits = jnp.split(out, 2, axis=-1)
        total = training_losses(schedule, eps, var_logits, x_start_j, x_t,
                                t_j, noise_j)
        mse = jnp.mean((noise_j - eps.astype(jnp.float32)) ** 2,
                       axis=(1, 2))
        return total, mse

    loss_j, mse_j = (np.asarray(v) for v in model.apply(variables, method=run))
    loss_ref = _np(terms["loss"])
    print(f"training losses ref={loss_ref} jax={loss_j}")
    np.testing.assert_allclose(loss_ref, loss_j, rtol=2e-3, atol=2e-4)
    # components, for diagnostics if the total ever drifts
    np.testing.assert_allclose(_np(terms["mse"]), mse_j, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(_np(terms["vb"]), loss_j - mse_j,
                               rtol=5e-3, atol=5e-4)


def test_vq_ema_dynamics_parity(ref_and_jax):
    """One train-mode step of the torch ``EuclideanCodebook``
    (core_vq.py:206-231: EMA order, Laplace smoothing, expiry-then-overwrite
    quirk) vs ours on an identical batch and identical starting buffers.
    Runs both the no-expiry case and the some-codes-expired case (where the
    reference's post-expiry EMA write overwrites the replacements, so the
    final buffers are deterministic in both frameworks)."""
    from vqvae.modules.core_vq import EuclideanCodebook as TorchCodebook

    from detail_tts_tpu.models.quantizer import EuclideanCodebook

    rng = np.random.default_rng(23)
    dim, size, n = 8, 64, 200
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    embed0 = rng.normal(0, 1, (size, dim)).astype(np.float32)
    embed_avg0 = embed0 + rng.normal(0, 0.1, (size, dim)).astype(np.float32)

    for case, cluster0 in (
            ("no-expiry", rng.uniform(2.5, 9.0, (size,)).astype(np.float32)),
            ("with-expiry", rng.uniform(0.0, 6.0, (size,)).astype(np.float32))):
        tcb = TorchCodebook(dim=dim, codebook_size=size, kmeans_init=True,
                            decay=0.99, epsilon=1e-5,
                            threshold_ema_dead_code=2)
        with torch.no_grad():
            tcb.inited.fill_(1)
            tcb.embed.copy_(torch.from_numpy(embed0))
            tcb.embed_avg.copy_(torch.from_numpy(embed_avg0))
            tcb.cluster_size.copy_(torch.from_numpy(cluster0))
        tcb.train()
        q_ref, ids_ref = tcb(torch.from_numpy(x.copy()))

        module = EuclideanCodebook(codebook_size=size, dim=dim, decay=0.99,
                                   epsilon=1e-5, threshold_ema_dead_code=2.0)
        vq_state = {
            "inited": jnp.ones((), bool),
            "cluster_size": jnp.asarray(cluster0),
            "embed": jnp.asarray(embed0),
            "embed_avg": jnp.asarray(embed_avg0),
        }
        (q_j, ids_j), mut = module.apply(
            {"vq_state": vq_state}, jnp.asarray(x), train=True,
            mutable=["vq_state"], rngs={"vq": jax.random.PRNGKey(0)})
        new = mut["vq_state"]

        np.testing.assert_array_equal(_np(ids_ref), np.asarray(ids_j),
                                      err_msg=case)
        np.testing.assert_allclose(_np(q_ref), np.asarray(q_j), atol=1e-6,
                                   err_msg=case)
        np.testing.assert_allclose(_np(tcb.cluster_size),
                                   np.asarray(new["cluster_size"]),
                                   rtol=1e-5, atol=1e-6, err_msg=case)
        np.testing.assert_allclose(_np(tcb.embed_avg),
                                   np.asarray(new["embed_avg"]),
                                   rtol=1e-5, atol=1e-6, err_msg=case)
        np.testing.assert_allclose(_np(tcb.embed), np.asarray(new["embed"]),
                                   rtol=1e-4, atol=1e-5, err_msg=case)


def test_discriminator_and_gan_loss_parity(ref_and_jax):
    """C9 numerics: converted-weights MPD forward (logits + feature maps,
    model_24k.py:298-431) and the four GAN losses (modules/losses.py:4-58)
    on identical inputs."""
    from vqvae.model_24k import MultiPeriodDiscriminator as TorchMPD

    from detail_tts_tpu.io.torch_convert import convert_discriminator_state_dict
    from detail_tts_tpu.models.discriminator import MultiPeriodDiscriminator
    from detail_tts_tpu.train import losses as L

    torch.manual_seed(5)
    tmpd = TorchMPD().eval()

    disc = MultiPeriodDiscriminator()
    seg = 10240
    template = disc.init(jax.random.PRNGKey(0), jnp.zeros((2, seg, 1)),
                         jnp.zeros((2, seg, 1)))["params"]
    d_params, report = convert_discriminator_state_dict(
        tmpd.state_dict(), template)
    assert not report["unmapped"], report["unmapped"][:10]
    assert not report["missing"], report["missing"][:10]
    assert not report["unconsumed"], report["unconsumed"][:10]

    rng = np.random.default_rng(29)
    y = np.tanh(rng.normal(0, 0.4, (2, 1, seg))).astype(np.float32)
    y_hat = np.tanh(rng.normal(0, 0.4, (2, 1, seg))).astype(np.float32)

    from vqvae.modules import losses as ref_losses

    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = tmpd(torch.from_numpy(y),
                                            torch.from_numpy(y_hat))
        loss_d_ref, _, _ = ref_losses.discriminator_loss(r_ref, g_ref)
        loss_g_ref, _ = ref_losses.generator_loss(g_ref)
        loss_fm_ref = ref_losses.feature_loss(fr_ref, fg_ref)

    r_j, g_j, fr_j, fg_j = disc.apply(
        {"params": d_params}, jnp.asarray(y.transpose(0, 2, 1)),
        jnp.asarray(y_hat.transpose(0, 2, 1)))

    assert len(r_ref) == len(r_j) == 6
    for i, (rr, rj) in enumerate(zip(r_ref, r_j)):
        np.testing.assert_allclose(_np(rr), np.asarray(rj), atol=2e-3,
                                   rtol=1e-2, err_msg=f"real logits disc {i}")
    for i, (gr, gj) in enumerate(zip(g_ref, g_j)):
        np.testing.assert_allclose(_np(gr), np.asarray(gj), atol=2e-3,
                                   rtol=1e-2, err_msg=f"fake logits disc {i}")
    for i, (fr, fj) in enumerate(zip(fr_ref, fr_j)):
        assert len(fr) == len(fj)
        for k, (a, bb) in enumerate(zip(fr, fj)):
            a = _np(a)
            bb = np.asarray(bb)
            if a.ndim == 4:  # torch (B, C, H, W) vs ours (B, H, W, C)
                a = a.transpose(0, 2, 3, 1)
            else:  # torch (B, C, T) vs ours (B, T, C)
                a = a.transpose(0, 2, 1)
            np.testing.assert_allclose(a, bb, atol=2e-3, rtol=1e-2,
                                       err_msg=f"fmap disc {i} layer {k}")

    # converter reparam mode: the same torch state dict mapped onto the
    # (g, v) training parameterization produces identical logits
    from detail_tts_tpu.nn.common import weight_norm_reparam

    with weight_norm_reparam():
        template_wn = disc.init(jax.random.PRNGKey(0), jnp.zeros((2, seg, 1)),
                                jnp.zeros((2, seg, 1)))["params"]
        d_params_wn, report_wn = convert_discriminator_state_dict(
            tmpd.state_dict(), template_wn, weight_norm="reparam")
        assert not report_wn["unmapped"], report_wn["unmapped"][:10]
        assert not report_wn["missing"], report_wn["missing"][:10]
        r_wn, g_wn, _, _ = disc.apply(
            {"params": d_params_wn}, jnp.asarray(y.transpose(0, 2, 1)),
            jnp.asarray(y_hat.transpose(0, 2, 1)))
    for rj, rw in zip(r_j, r_wn):
        np.testing.assert_allclose(np.asarray(rj), np.asarray(rw), atol=1e-4)
    for gj, gw in zip(g_j, g_wn):
        np.testing.assert_allclose(np.asarray(gj), np.asarray(gw), atol=1e-4)

    loss_d_j, _, _ = L.discriminator_loss(r_j, g_j)
    loss_g_j, _ = L.generator_loss(g_j)
    loss_fm_j = L.feature_loss(
        [[jnp.asarray(_np(a)) for a in d] for d in fr_ref],
        [[jnp.asarray(_np(a)) for a in d] for d in fg_ref])
    np.testing.assert_allclose(float(loss_d_ref), float(loss_d_j), rtol=1e-3)
    np.testing.assert_allclose(float(loss_g_ref), float(loss_g_j), rtol=1e-3)
    np.testing.assert_allclose(float(loss_fm_ref), float(loss_fm_j), rtol=1e-3)

    # kl_loss element math on random tensors (losses.py:44-58)
    z_p = rng.normal(0, 1, (2, 192, 40)).astype(np.float32)
    logs_q = rng.normal(0, 0.3, (2, 192, 40)).astype(np.float32)
    m_p = rng.normal(0, 1, (2, 192, 40)).astype(np.float32)
    logs_p = rng.normal(0, 0.3, (2, 192, 40)).astype(np.float32)
    mask = (rng.uniform(size=(2, 1, 40)) > 0.2).astype(np.float32)
    kl_ref = ref_losses.kl_loss(
        torch.from_numpy(z_p), torch.from_numpy(logs_q), torch.from_numpy(m_p),
        torch.from_numpy(logs_p), torch.from_numpy(mask))
    kl_j = L.kl_loss(jnp.asarray(z_p.transpose(0, 2, 1)),
                     jnp.asarray(logs_q.transpose(0, 2, 1)),
                     jnp.asarray(m_p.transpose(0, 2, 1)),
                     jnp.asarray(logs_p.transpose(0, 2, 1)),
                     jnp.asarray(mask.transpose(0, 2, 1)))
    np.testing.assert_allclose(float(kl_ref), float(kl_j), rtol=1e-5)


def test_dpmpp_2m_sampler_loop_parity(ref_and_jax):
    """The reference's CONFIGURED sampler (model_24k.py:583 'dpm++2m' ->
    k_diffusion_sample_loop -> in-tree DPM_Solver on a continuous linear
    NoiseScheduleVP with CONSTANT classifier-free guidance,
    utils/diffusion.py:487-581) vs dpmpp_2m_reference_sample_loop, same
    converted weights and same start noise.  The solver is deterministic,
    so this pins the whole algorithm: the continuous schedule constants,
    time_uniform spacing, t*1000 model times, constant-k CFG combine,
    unclipped data prediction, and the multistep-2 update coefficients.
    """
    from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
    from detail_tts_tpu.models.diffusion import dpmpp_2m_reference_sample_loop

    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(37)
    b, t_code = 1, 6
    t_mel = t_code * FRAMES_PER_CODE
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    noise = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        out_ref = _np(G.infer_diffuser.sample_loop(
            G.diffusion, (b, 128, t_mel), noise=torch.from_numpy(noise),
            model_kwargs={"aligned_conditioning": torch.from_numpy(latents),
                          "conditioning_latent": cond_ref}))

    def run(m):
        cond = m.diffusion_conditioning(jnp.asarray(refer.transpose(0, 2, 1)))
        code_emb = m.diffusion_code_embedding(jnp.asarray(latents), cond)
        biases = m.diffusion_attention_biases(t_mel)

        def model_fn(x, t_orig, conditioning_free):
            if x.shape[0] == 2 * b:
                return m.diffusion_cfg_step(x, t_orig, code_emb, biases)
            cf = (jnp.zeros((x.shape[0],), bool) if conditioning_free is None
                  else conditioning_free)
            return m.diffusion_step(x, t_orig, code_emb, cf, biases)

        return dpmpp_2m_reference_sample_loop(
            model_fn, jnp.asarray(noise.transpose(0, 2, 1)),
            steps=cfg.diffusion.infer_steps,
            guidance_scale=cfg.diffusion.cond_free_k)

    out_j = np.asarray(model.apply(variables, method=run))
    l1 = float(np.mean(np.abs(out_ref.transpose(0, 2, 1) - out_j)))
    print(f"dpm++2m loop mel L1 vs reference: {l1:.6f}")
    assert l1 <= 1e-2, l1
    np.testing.assert_allclose(out_ref.transpose(0, 2, 1), out_j,
                               atol=5e-3, rtol=1e-2)


def test_dpmpp_2m_small_steps_lower_order_final(ref_and_jax):
    """steps < 10 branch: the reference samples with lower_order_final=True,
    which drops the FINAL multistep update to first order (step_order =
    min(order, steps+1-step), dpm_solver.py:1197-1200).  The live config is
    steps=50 (branch never fires), but EngineConfig exposes the step count —
    this pins the small-steps behavior by invoking the reference's in-tree
    DPM_Solver directly with steps=6, mirroring k_diffusion_sample_loop's
    construction (utils/diffusion.py:516-580)."""
    from vqvae.utils.dpm_solver import (DPM_Solver, NoiseScheduleVP,
                                        model_wrapper)

    from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
    from detail_tts_tpu.models.diffusion import dpmpp_2m_reference_sample_loop

    G, model, variables, cfg = ref_and_jax
    steps = 6
    rng = np.random.default_rng(41)
    b, t_code = 1, 6
    t_mel = t_code * FRAMES_PER_CODE
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    noise = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        mk = {"aligned_conditioning": torch.from_numpy(latents),
              "conditioning_latent": cond_ref}

        def model_split(x, t, **kw):
            out = G.diffusion(x, t, **kw, **mk)
            eps, _ = torch.split(out, out.shape[1] // 2, dim=1)
            return eps

        # diffusion.py:519-544 sans pbar; model_wrapper's classifier-free
        # branch passes its dummy cond POSITIONALLY (dpm_solver.py:287)
        def prewrap(x, t, *args, **kw):
            x, _ = x.chunk(2)
            t, _ = (t * 1000).chunk(2)
            return torch.cat([model_split(x, t, conditioning_free=True),
                              model_split(x, t)])

        ns = NoiseScheduleVP(schedule="linear", continuous_beta_0=0.1 / 4,
                             continuous_beta_1=20.0 / 4)
        fn = model_wrapper(prewrap, ns, model_type="noise",
                           guidance_type="classifier-free",
                           condition=torch.Tensor(1),
                           unconditional_condition=torch.Tensor(1),
                           guidance_scale=cfg.diffusion.cond_free_k)
        solver = DPM_Solver(fn, ns, algorithm_type="dpmsolver++")
        out_ref = _np(solver.sample(torch.from_numpy(noise), steps=steps,
                                    order=2, skip_type="time_uniform",
                                    method="multistep"))

    def run(m):
        cond = m.diffusion_conditioning(jnp.asarray(refer.transpose(0, 2, 1)))
        code_emb = m.diffusion_code_embedding(jnp.asarray(latents), cond)
        biases = m.diffusion_attention_biases(t_mel)

        def model_fn(x, t_orig, conditioning_free):
            if x.shape[0] == 2 * b:
                return m.diffusion_cfg_step(x, t_orig, code_emb, biases)
            cf = (jnp.zeros((x.shape[0],), bool) if conditioning_free is None
                  else conditioning_free)
            return m.diffusion_step(x, t_orig, code_emb, cf, biases)

        return dpmpp_2m_reference_sample_loop(
            model_fn, jnp.asarray(noise.transpose(0, 2, 1)), steps=steps,
            guidance_scale=cfg.diffusion.cond_free_k)

    out_j = np.asarray(model.apply(variables, method=run))
    l1 = float(np.mean(np.abs(out_ref.transpose(0, 2, 1) - out_j)))
    print(f"dpm++2m steps=6 mel L1 vs reference: {l1:.6f}")
    assert l1 <= 1e-2, l1
    np.testing.assert_allclose(out_ref.transpose(0, 2, 1), out_j,
                               atol=5e-3, rtol=1e-2)


def test_kv_cache_decode_logits_parity(ref_and_jax):
    """Teacher-forced logits equivalence of the KV-cached decode path.

    The serving chain ``prefill_embeddings -> decode_prefill -> decode_step``
    (models/gpt.py:259-291) must reproduce the training ``__call__``'s
    ``mel_logits`` position by position: the training forward is pinned
    against the torch reference (test_gpt_forward_parity), so equality here
    transitively pins the cached path that actually samples the audio
    (reference semantics: GPT2InferenceModel.forward, gpt/model.py:107-186 +
    model_24k.py:782-799).  A position-offset, cache-mask or
    dynamic_update_slice bug would shift every sampled distribution and
    still pass the length-only serving tests.

    Covers: full model size with converted weights, fp32 cache, a batch with
    unequal text lengths (trailing stop_text_token padding), codes whose
    padding region goes through set_mel_padding, and a cache whose max_len
    exceeds the decoded sequence (cache-region masking).
    """
    from detail_tts_tpu.models.gpt import UnifiedVoice

    G, model, variables, cfg = ref_and_jax
    c = cfg.gpt
    rng = np.random.default_rng(31)
    b, t_cond, t_text, t_code = 2, 48, 12, 16
    cond = rng.normal(-6, 2, (b, 128, t_cond)).astype(np.float32)
    cond_len = np.array([t_cond, t_cond - 8], np.int32)
    text = rng.integers(3, 200, (b, t_text)).astype(np.int32)
    text[1, 8:] = c.stop_text_token  # unequal text lengths in one batch
    codes = rng.integers(0, 8192, (b, t_code)).astype(np.int32)
    # row 1 exercises the set_mel_padding stop-fill region
    wav_len = np.array([t_code * 1024, (t_code - 5) * 1024], np.int32)

    gpt_module = UnifiedVoice(cfg.gpt)
    gpt_vars = {"params": variables["params"]["gpt"]}

    # ---- oracle: the (torch-pinned) training forward's mel logits
    _, _, mel_logits = gpt_module.apply(
        gpt_vars, jnp.asarray(cond.transpose(0, 2, 1)), jnp.asarray(cond_len),
        jnp.asarray(text), None, jnp.asarray(codes), jnp.asarray(wav_len),
        deterministic=True)
    mel_logits = np.asarray(mel_logits)  # (B, t_code + 2, V)

    # ---- the decode-path inputs: replicate the training-side alignment
    # (set_mel_padding stop-fill, +1 stop pad, start/stop build_aligned)
    mel_lengths = wav_len // c.mel_length_compression
    pos = np.arange(t_code)[None, :]
    stopped = np.where(pos < (mel_lengths[:, None] + 1), codes,
                       c.stop_mel_token)
    mel_padded = np.pad(stopped, ((0, 0), (0, 1)),
                        constant_values=c.stop_mel_token)
    mel_inp = np.pad(mel_padded, ((0, 0), (1, 0)),
                     constant_values=c.start_mel_token)  # (B, t_code + 2)

    prefill = gpt_module.apply(
        gpt_vars, jnp.asarray(cond.transpose(0, 2, 1)), jnp.asarray(cond_len),
        jnp.asarray(text), method=UnifiedVoice.prefill_embeddings)
    # cache deliberately LONGER than the sequence: positions past the write
    # head must stay masked out of the attention
    max_len = prefill.shape[1] + mel_inp.shape[1] + 7
    cache = gpt_module.apply(gpt_vars, b, max_len, jnp.float32,
                             method=UnifiedVoice.init_cache)
    logits0, cache = gpt_module.apply(gpt_vars, prefill, cache,
                                      method=UnifiedVoice.decode_prefill)
    np.testing.assert_allclose(np.asarray(logits0), mel_logits[:, 0],
                               atol=1e-4, rtol=1e-4)

    step = jax.jit(lambda tok, p, cch: gpt_module.apply(
        gpt_vars, tok, p, cch, method=UnifiedVoice.decode_step))
    for j in range(1, mel_inp.shape[1]):
        tok = jnp.asarray(mel_inp[:, j])
        logits_j, cache = step(tok, jnp.full((b,), j, jnp.int32), cache)
        np.testing.assert_allclose(
            np.asarray(logits_j), mel_logits[:, j], atol=1e-4, rtol=1e-4,
            err_msg=f"cached decode logits diverge at mel position {j}")


def test_ddim_loop_bf16_serving_precision(ref_and_jax):
    """BASELINE budget check: bf16 weights/activations (the serving policy)
    keep the deterministic diffusion mel within L1 1e-2 of the reference's
    fp32 loop (BASELINE.md: mel L1 <= 1e-2 vs PyTorch)."""
    from detail_tts_tpu.audio.mel import FRAMES_PER_CODE
    from detail_tts_tpu.models.diffusion import ddim_sample_loop
    from detail_tts_tpu.models.synthesizer import make_infer_schedule

    G, model, variables, cfg = ref_and_jax
    rng = np.random.default_rng(13)
    b, t_code = 1, 6
    t_mel = t_code * FRAMES_PER_CODE
    latents = rng.normal(0, 1, (b, t_code, 768)).astype(np.float32)
    refer = rng.normal(-6, 2, (b, 128, 48)).astype(np.float32)
    noise = rng.normal(0, 1, (b, 128, t_mel)).astype(np.float32)

    with torch.no_grad():
        cond_ref = G.diffusion.get_conditioning(torch.from_numpy(refer))
        out_ref = _np(G.infer_diffuser.ddim_sample_loop(
            G.diffusion, (b, 128, t_mel), noise=torch.from_numpy(noise),
            model_kwargs={"aligned_conditioning": torch.from_numpy(latents),
                          "conditioning_latent": cond_ref}))

    # bf16 weights, exactly as TTSEngine casts them (pipeline.py)
    bf16_vars = {
        "params": jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
            variables["params"]),
        "vq_state": variables["vq_state"],
    }
    schedule = make_infer_schedule(cfg)

    def run(m):
        cond = m.diffusion_conditioning(
            jnp.asarray(refer.transpose(0, 2, 1), jnp.bfloat16))
        code_emb = m.diffusion_code_embedding(
            jnp.asarray(latents, jnp.bfloat16), cond)
        biases = m.diffusion_attention_biases(t_mel)
        biases = [bb.astype(jnp.bfloat16) for bb in biases]

        def model_fn(x, t_orig, conditioning_free):
            if x.shape[0] == 2 * b:
                return m.diffusion_cfg_step(x.astype(jnp.bfloat16), t_orig,
                                            code_emb, biases)
            cf = (jnp.zeros((x.shape[0],), bool) if conditioning_free is None
                  else conditioning_free)
            return m.diffusion_step(x.astype(jnp.bfloat16), t_orig, code_emb,
                                    cf, biases)

        return ddim_sample_loop(
            schedule, model_fn, jnp.asarray(noise.transpose(0, 2, 1)),
            cond_free_k=cfg.diffusion.cond_free_k, conditioning_free=True)

    out_j = np.asarray(model.apply(bf16_vars, method=run))
    # normalized-mel domain, like the reference loop output
    l1 = float(np.mean(np.abs(out_ref.transpose(0, 2, 1) - out_j)))
    print(f"bf16 serving-vs-fp32-reference diffusion mel L1: {l1:.5f}")
    assert l1 <= 1e-2, l1
