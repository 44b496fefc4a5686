"""All-in-one synthesizer: VQ-VAE + GPT + diffusion + flow-VAE + HiFi-GAN.

Equivalent of the reference ``SynthesizerTrn`` (vqvae/model_24k.py:510-881):
owns every sub-model, the stage-dispatched training forwards, and the
inference pipelines.  All tensors are NTC; waveforms are (B, T, 1).

Stage forwards return loss *components*; weighting/assembly happens in the
trainer (mirrors train.py:259-460).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from detail_tts_tpu.audio.mel import FRAMES_PER_CODE, normalize_mel
from detail_tts_tpu.config import Config
from detail_tts_tpu.models.diffusion import (DiffusionSchedule,
                                             get_named_beta_schedule,
                                             space_timesteps, training_losses)
from detail_tts_tpu.models.diffusion_model import DiffusionTts
from detail_tts_tpu.models.flowvae import (PosteriorEncoder,
                                           ResidualCouplingBlock, SpecEncoder)
from detail_tts_tpu.models.gpt import UnifiedVoice
from detail_tts_tpu.models.quantizer import ResidualVectorQuantizer
from detail_tts_tpu.models.vocoder import HiFiGANGenerator
from detail_tts_tpu.nn.common import (Conv1d, ConvTranspose1d, TorchLayerNorm,
                                      rand_slice_starts, sequence_mask,
                                      slice_segments)
from detail_tts_tpu.nn.style_encoder import MelStyleEncoder


def make_train_schedule(cfg: Config) -> DiffusionSchedule:
    """200-of-4000 spaced training diffuser (model_24k.py:578-580)."""
    d = cfg.diffusion
    return DiffusionSchedule.create(
        get_named_beta_schedule("linear", d.trained_steps),
        space_timesteps(d.trained_steps, [d.train_sample_steps]))


def make_infer_schedule(cfg: Config) -> DiffusionSchedule:
    """50-of-4000 spaced inference diffuser (model_24k.py:581-583)."""
    d = cfg.diffusion
    return DiffusionSchedule.create(
        get_named_beta_schedule("linear", d.trained_steps),
        space_timesteps(d.trained_steps, [d.infer_steps]))


class FlowVAEOutputs(NamedTuple):
    y_hat_slice: jax.Array     # (B, segment, 1) generated wav slice
    ids_slice: jax.Array       # (B,) frame slice starts
    z: jax.Array
    z_p: jax.Array
    m_p: jax.Array
    logs_p: jax.Array
    m_q: jax.Array
    logs_q: jax.Array
    y_mask: jax.Array


class SynthesizerTrn(nn.Module):
    cfg: Config

    def setup(self):
        v = self.cfg.vaegan
        d = self.cfg.data
        inter = v.inter_channels
        mel_ch = d.n_mel_channels

        self.dec = HiFiGANGenerator(
            initial_channel=inter, resblock=v.resblock,
            resblock_kernel_sizes=tuple(v.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(map(tuple, v.resblock_dilation_sizes)),
            upsample_rates=tuple(v.upsample_rates),
            upsample_initial_channel=v.upsample_initial_channel,
            upsample_kernel_sizes=tuple(v.upsample_kernel_sizes),
            gin_channels=v.gin_channels, name="dec")

        self.diffusion = DiffusionTts(self.cfg.diffusion, name="diffusion")
        self.in_proj = Conv1d(inter, 3, padding=1, name="in_proj")
        self.enc_p = SpecEncoder(
            inter, v.hidden_channels, v.filter_channels, v.n_heads,
            v.n_layers, v.kernel_size, v.p_dropout, sample=True, name="enc_p")
        self.enc_q = PosteriorEncoder(
            d.spec_channels, inter, v.hidden_channels, kernel_size=5,
            dilation_rate=1, n_layers=16, gin_channels=v.gin_channels,
            sample=True, name="enc_q")
        self.flow = ResidualCouplingBlock(
            inter, v.hidden_channels, 5, 1, 4, gin_channels=v.gin_channels,
            name="flow")
        self.ref_enc = MelStyleEncoder(
            n_mel_channels=mel_ch, style_vector_dim=v.gin_channels,
            name="ref_enc")
        self.quantizer = ResidualVectorQuantizer(
            dimension=inter * 4, n_q=v.vq_n_q, bins=v.vq_bins,
            codebook_dim=v.vq_codebook_dim, decay=v.vq_decay,
            threshold_ema_dead_code=v.vq_threshold_ema_dead_code,
            kmeans_iters=v.vq_kmeans_iters, name="quantizer")
        self.gpt = UnifiedVoice(self.cfg.gpt, remat=self.cfg.train.remat_gpt,
                                name="gpt")

        # vq_enc (model_24k.py:606-615)
        self.vq_enc_norm = TorchLayerNorm(name="vq_enc_norm")
        self.vq_enc_conv0 = Conv1d(inter * 2, 3, stride=2, padding=1, name="vq_enc_conv0")
        self.vq_enc_conv1 = Conv1d(inter * 4, 3, stride=2, padding=1, name="vq_enc_conv1")
        self.vq_enc_conv2 = Conv1d(inter * 4, 3, padding=1, name="vq_enc_conv2")
        # vq_dec (model_24k.py:616-627)
        self.vq_dec_norm = TorchLayerNorm(name="vq_dec_norm")
        self.vq_dec_up0 = ConvTranspose1d(inter * 2, 3, stride=2, padding=1,
                                          output_padding=1, name="vq_dec_up0")
        self.vq_dec_up1 = ConvTranspose1d(inter, 3, stride=2, padding=1,
                                          output_padding=1, name="vq_dec_up1")
        self.vq_dec_conv = Conv1d(mel_ch, 3, padding=1, name="vq_dec_conv")
        self.vq_ref_enc = MelStyleEncoder(
            n_mel_channels=mel_ch, style_vector_dim=inter * 4, name="vq_ref_enc")

    # ------------------------------------------------------------------- VQ

    def vq_encode_features(self, mel: jax.Array) -> jax.Array:
        """mel (B, T, 128) -> (B, T//4, inter*4)."""
        h = self.vq_enc_norm(mel)
        h = jax.nn.silu(self.vq_enc_conv0(h))
        h = jax.nn.silu(self.vq_enc_conv1(h))
        return self.vq_enc_conv2(h)

    def vq_decode_features(self, q: jax.Array) -> jax.Array:
        """(B, T//4, inter*4) -> mel (B, T, 128)."""
        h = self.vq_dec_norm(q)
        h = jax.nn.silu(self.vq_dec_up0(h))
        h = jax.nn.silu(self.vq_dec_up1(h))
        return self.vq_dec_conv(h)

    def encode(self, mel: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Frozen code extraction (model_24k.py:877-880): (codes, features)."""
        x = self.vq_encode_features(mel)
        codes = self.quantizer.encode(x)[0]  # first (only) RVQ layer
        return jax.lax.stop_gradient(codes), jax.lax.stop_gradient(x)

    def encode_masked(self, mel: jax.Array, lengths: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        """Length-exact code extraction on PADDED buffers.

        Zeroing each layer's activations beyond its valid length makes the
        next conv see exactly the zero-padding a per-file exact-length run
        (the reference's offline extractor, prepare/extract_vq.py:18-46)
        would see — so bucketed static-shape extraction returns bit-identical
        codes regardless of the pad content.  Valid lengths follow the torch
        conv arithmetic: stride-2/k3/p1 maps L -> ceil(L/2).

        Returns (codes (B, T_pad//4), code_lengths (B,)).
        """
        m0 = sequence_mask(lengths, mel.shape[1])[..., None]
        h = self.vq_enc_norm(mel) * m0
        h = jax.nn.silu(self.vq_enc_conv0(h))
        l1 = (lengths + 1) // 2
        h = h * sequence_mask(l1, h.shape[1])[..., None]
        h = jax.nn.silu(self.vq_enc_conv1(h))
        l2 = (l1 + 1) // 2
        h = h * sequence_mask(l2, h.shape[1])[..., None]
        x = self.vq_enc_conv2(h)
        codes = self.quantizer.encode(x)[0]
        return jax.lax.stop_gradient(codes), l2

    def forward_vq(self, mel: jax.Array, mel_lengths: jax.Array,
                   train: bool = True, axis_name: Optional[str] = None):
        """VQ-VAE stage (model_24k.py:654-666): returns (recon_loss, commit)."""
        y_mask = sequence_mask(mel_lengths, mel.shape[1])[..., None]
        x = self.vq_encode_features(mel)
        quantized, _, commit = self.quantizer(x, train=train, axis_name=axis_name)
        g_vq = self.vq_ref_enc(mel * y_mask, y_mask[..., 0])
        quantized = quantized + g_vq[:, None, :]
        recon = self.vq_decode_features(quantized)
        recon_loss = jnp.mean(jnp.abs(recon - mel))
        return recon_loss, commit

    # ------------------------------------------------------------------ GPT

    def forward_gpt(self, data: Dict[str, jax.Array], deterministic: bool = False):
        """GPT stage (model_24k.py:697-704): returns (loss_text, loss_mel)."""
        codes, _ = self.encode(data["raw_mel"])
        loss_text, loss_mel, _ = self.gpt(
            data["mel"], data["spec_length"], data["text"],
            data["text_length"], codes, data["raw_wav_length"],
            deterministic=deterministic)
        return loss_text, loss_mel

    def gpt_latents(self, data: Dict[str, jax.Array]) -> jax.Array:
        """Aligned GPT latents for diffusion training (model_24k.py:674-679)."""
        codes, _ = self.encode(data["raw_mel"])
        latents = self.gpt(
            data["raw_mel"], data["raw_spec_length"], data["text"],
            data["text_length"], codes, data["raw_wav_length"],
            return_latent=True, deterministic=True)
        return jax.lax.stop_gradient(latents)

    # ------------------------------------------------------------ diffusion

    def forward_diff(self, data: Dict[str, jax.Array],
                     schedule: DiffusionSchedule, rng: jax.Array,
                     deterministic: bool = False) -> jax.Array:
        """Diffusion stage (model_24k.py:667-696): scalar loss."""
        mel = data["mel"]
        raw_mel = data["raw_mel"]
        x_start = normalize_mel(raw_mel)
        b = x_start.shape[0]

        t_rng, n_rng, u_rng, ld_rng = jax.random.split(rng, 4)
        t = jax.random.randint(t_rng, (b,), 0, schedule.num_timesteps)
        noise = jax.random.normal(n_rng, x_start.shape, jnp.float32)
        x_t = schedule.q_sample(x_start, t, noise)

        latents = self.gpt_latents(data)
        cond_latent = self.diffusion.get_conditioning(mel)

        uncond = (jax.random.uniform(u_rng, (b,))
                  < self.cfg.diffusion.unconditioned_percentage)
        code_emb = self.diffusion.timestep_independent(
            latents, cond_latent, x_start.shape[1], unconditioned_mask=uncond)

        out = self.diffusion(
            x_t, schedule.timestep_map[t], precomputed_embeddings=code_emb,
            layer_drop_rng=ld_rng, deterministic=deterministic)
        eps, var_logits = jnp.split(out, 2, axis=-1)
        loss = training_losses(schedule, eps, var_logits, x_start, x_t, t, noise)
        return jnp.mean(loss)

    # -------------------------------------------------------------- flowvae

    def forward_flowvae(self, mel: jax.Array, spec: jax.Array,
                        lengths: jax.Array, rng: jax.Array,
                        deterministic: bool = False) -> FlowVAEOutputs:
        """GAN stage forward (model_24k.py:706-737)."""
        segment_frames = self.cfg.train.segment_size // self.cfg.data.hop_length
        y_mask = sequence_mask(lengths, mel.shape[1])[..., None]
        g = self.ref_enc(mel * y_mask, y_mask[..., 0],
                         deterministic=deterministic)

        x = self.in_proj(mel)
        x, m_p, logs_p = self.enc_p(x, lengths, deterministic=deterministic)

        q_rng, s_rng = jax.random.split(rng)
        z, m_q, logs_q = self.enc_q(spec, lengths, q_rng, g=g)
        z_p = self.flow(z, y_mask, g=g)

        starts = rand_slice_starts(s_rng, lengths, segment_frames)
        z_slice = slice_segments(z, starts, segment_frames)
        y_hat = self.dec(z_slice, g=g)
        return FlowVAEOutputs(y_hat, starts, z, z_p, m_p, logs_p, m_q, logs_q,
                              y_mask)

    # ------------------------------------------------------------ inference

    def infer_flowvae(self, mel: jax.Array, lengths: jax.Array,
                      rng: jax.Array, noise_scale: float = 0.667) -> jax.Array:
        """mel -> wav (model_24k.py:848-863)."""
        y_mask = sequence_mask(lengths, mel.shape[1])[..., None]
        g = self.ref_enc(mel * y_mask, y_mask[..., 0])
        x = self.in_proj(mel)
        _, m_p, logs_p = self.enc_p(x, lengths)
        eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        return self.dec(z, g=g)

    def infer_vqvae(self, mel: jax.Array, rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """VQ round-trip + vocoder (model_24k.py:864-876)."""
        lengths = jnp.full((mel.shape[0],), mel.shape[1], jnp.int32)
        x = self.vq_encode_features(mel)
        q, _, _ = self.quantizer(x)
        y_mask = sequence_mask(lengths, mel.shape[1])[..., None]
        g_vq = self.vq_ref_enc(mel * y_mask, y_mask[..., 0])
        recon = self.vq_decode_features(q + g_vq[:, None, :])
        wav = self.infer_flowvae(recon, lengths, rng)
        return recon, wav

    def decode_codes_to_mel(self, codes: jax.Array, refer_mel: jax.Array,
                            refer_lengths: jax.Array) -> jax.Array:
        """VQ codes -> mel via vq_dec, diffusion-free (model_24k.py:811-846)."""
        latent = self.quantizer.decode(codes[None])  # (B, T, inter*4)
        refer_mask = sequence_mask(refer_lengths, refer_mel.shape[1])[..., None]
        g_vq = self.vq_ref_enc(refer_mel * refer_mask, refer_mask[..., 0])
        return self.vq_decode_features(latent + g_vq[:, None, :])

    def diffusion_conditioning(self, refer_mel: jax.Array) -> jax.Array:
        return self.diffusion.get_conditioning(refer_mel)

    def diffusion_code_embedding(self, latents: jax.Array,
                                 cond_latent: jax.Array) -> jax.Array:
        """Precompute the timestep-independent embedding for sampling."""
        return self.diffusion.timestep_independent(
            latents, cond_latent, latents.shape[1] * FRAMES_PER_CODE)

    def diffusion_step(self, x: jax.Array, t_orig: jax.Array,
                       code_emb: jax.Array,
                       conditioning_free: jax.Array,
                       attn_biases: Optional[list] = None
                       ) -> Tuple[jax.Array, jax.Array]:
        """One (possibly 2B-batched CFG) diffusion net call."""
        out = self.diffusion(x, t_orig, precomputed_embeddings=code_emb,
                             conditioning_free=conditioning_free,
                             precomputed_biases=attn_biases)
        eps, var = jnp.split(out, 2, axis=-1)
        return eps, var

    def diffusion_attention_biases(self, length: int) -> list:
        """T5 rel-pos biases for all diffusion attention blocks (hoistable)."""
        return self.diffusion.attention_biases(length)

    def diffusion_cfg_step(self, x2: jax.Array, t_orig2: jax.Array,
                           code_emb_cond: jax.Array,
                           attn_biases: Optional[list] = None
                           ) -> Tuple[jax.Array, jax.Array]:
        """One CFG net call: x2/t2 are 2B-stacked [cond | uncond]."""
        out = self.diffusion.cfg_call(x2, t_orig2, code_emb_cond,
                                      precomputed_biases=attn_biases)
        eps, var = jnp.split(out, 2, axis=-1)
        return eps, var

    # ----------------------------------------------------------------- init

    def init_all(self, data: Dict[str, jax.Array],
                 schedule: DiffusionSchedule, rng: jax.Array):
        """Touch every live submodule once so ``.init`` creates all params.

        (flax creates params lazily at first call; the torch reference
        instantiates everything in __init__.)
        """
        r_d, r_f = jax.random.split(rng)
        self.forward_vq(data["mel"], data["spec_length"], train=False)
        self.forward_gpt(data, deterministic=True)
        self.forward_diff(data, schedule, r_d, deterministic=True)
        self.forward_flowvae(data["mel"], data["spec"], data["spec_length"],
                             r_f, deterministic=True)
        return None
