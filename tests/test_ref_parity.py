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


@pytest.fixture(scope="module")
def ref_and_jax():
    G, _ = load_reference_synthesizer()
    cfg = Config()
    model = SynthesizerTrn(cfg)
    template = init_variables(model, cfg, jax.random.PRNGKey(0))
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
