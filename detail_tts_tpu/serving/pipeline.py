"""Serving engine: zero-shot synthesis pipelines, jit-compiled per bucket.

Re-creates the reference inference surface (api.py + SynthesizerTrn.infer*
at vqvae/model_24k.py:774-876) as four fused, statically-shaped stages:

1. ``generate``   — AR mel-code decode with a real KV cache
                    (the reference ships kv_cache=False -> O(T^2) recompute)
2. ``latents``    — one full GPT pass over the generated codes
                    (return_latent, gpt/model.py:479-481)
3. ``diffuse``    — 50-step CFG ancestral sampling, cond+uncond batched into
                    single 2B model calls (the reference does 2 sequential
                    calls per step, utils/diffusion.py:313-315)
4. ``vocode``     — flow-VAE prior sample -> reverse flow -> HiFi-GAN

Recompilation control: prompt mels are *padded up* to a bucket with true
per-item lengths (masked style encoders are padding-invariant; the unmasked
diffusion conditioning runs per item at its own bucket), text and code
sequences are *padded up* to buckets (in-distribution: training pads both
with stop tokens).  Each (bucket-combo) compiles once and is cached by
jax.jit.

Diffusion-free path ``synthesize_vq`` mirrors ``infer_gpt``
(model_24k.py:811-846); ``vq_roundtrip`` mirrors ``infer_vqvae`` (:864).
"""
from __future__ import annotations

import dataclasses
import functools
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.audio.mel import (FRAMES_PER_CODE, MelFrontend,
                                      denormalize_mel)
from detail_tts_tpu.config import Config
from detail_tts_tpu.models.diffusion import p_sample_loop
from detail_tts_tpu.models.gpt import (SamplingConfig, UnifiedVoice,
                                       generate_speech_tokens)
from detail_tts_tpu.models.synthesizer import SynthesizerTrn, make_infer_schedule
from detail_tts_tpu.text.pinyin import to_pinyin
from detail_tts_tpu.text.tokenizer import make_tokenizer


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Serving knobs (defaults = the reference's shipped settings)."""

    temperature: float = 0.8          # model_24k.py:827
    top_p: float = 0.8
    repetition_penalty: float = 2.0
    max_generate_length: int = 600
    typical_mass: float = 1.0         # <1.0 enables entropy-typical sampling
    noise_scale: float = 0.667        # model_24k.py:858
    diffusion_temperature: float = 1.0
    # 'ancestral' is the reference's LIVE path (p_sample_loop, model_24k.py:489);
    # 'dpmpp_2m' is its *configured* sampler matched exactly (model_24k.py:583
    # -> k_diffusion_sample_loop -> in-tree DPM_Solver, parity-tested);
    # 'ddim' and 'dpmpp_2m_karras' (ramped-k discrete-karras variant) extra.
    diffusion_sampler: str = "ancestral"
    # Override cfg.diffusion.infer_steps (reference: 50).  Fewer steps trade
    # refinement quality for latency ~linearly (e.g. 25 + dpmpp_2m for a
    # fast mode); None keeps the reference count.
    diffusion_steps: Optional[int] = None
    # Convert to int16 PCM on device before the host transfer (halves the
    # device->host bytes; the serving wire format is PCM anyway).
    pcm16_output: bool = False
    # Bucketing (TPU addition: bounds the number of compiled programs)
    text_buckets: Sequence[int] = (32, 64, 128, 256, 512, 800)
    prompt_buckets: Sequence[int] = (64, 128, 256, 512, 1024, 1600)
    code_buckets: Sequence[int] = (100, 200, 300, 400, 500, 600)
    # Device-resident T5-bias cache: number of code buckets kept (each is
    # 13 x (H, 4*bucket, 4*bucket) bf16, ~1 GB at bucket 400 — recomputing
    # costs ~1 GB of HBM writes per request).
    bias_cache_buckets: int = 2
    cache_dtype: Any = jnp.bfloat16
    # bf16 weights/activations with fp32 islands (norms/softmax/sampler math);
    # None keeps fp32 end to end.
    compute_dtype: Any = jnp.bfloat16


def _bucket_up(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class InflightBatch:
    """Handle for a dispatched-but-unfetched batch (see dispatch_batch).

    ``wav`` is the on-device output (still computing asynchronously);
    ``eff`` the per-item code lengths already on host.  The handle holds
    device memory until finalized — keep at most a couple in flight.
    """

    wav: jnp.ndarray
    eff: np.ndarray
    n: int
    timings: Optional[Dict[str, float]] = None
    _t0: float = 0.0


@dataclasses.dataclass
class PendingDecode:
    """Phase-1 handle from :meth:`TTSEngine.dispatch_decode`.

    The AR decode and the diffusion conditioning are ENQUEUED on device but
    no host sync has happened yet — in particular not the decode-length
    (``eff``) sync that :meth:`TTSEngine.dispatch_tail` performs.  A server
    can therefore finalize the PREVIOUS batch between the two phases instead
    of paying the next batch's whole generate stage in every request's
    latency (the device FIFO keeps executing either way)."""

    codes: jnp.ndarray
    lengths: Optional[jnp.ndarray]  # device array; None under force_full
    diff_cond: jnp.ndarray
    refer_mel: jnp.ndarray
    refer_len: jnp.ndarray
    text: jnp.ndarray
    d_rng: jax.Array
    v_rng: jax.Array
    n: int
    max_len: int
    force_full: bool
    timings: Optional[Dict[str, float]] = None
    _t0: float = 0.0


class TTSEngine:
    """Stateless-weights serving engine around ``SynthesizerTrn``."""

    def __init__(self, cfg: Config, variables: Dict[str, Any],
                 engine_cfg: EngineConfig = EngineConfig(),
                 tokenizer: Optional[Any] = None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — weights get Megatron-style
        TP over the ``model`` axis (parallel/mesh.py rules) and request
        batches are sharded over the ``data`` axis; single-chip serving
        passes mesh=None (the reference has no serving parallelism at all,
        its inference is batch-1 single-GPU, model_24k.py:774)."""
        # Clamp serving knobs to the model's position-table capacity.  The
        # GPT's learned position tables are finite (mel: max_mel_tokens + 2 +
        # max_conditioning_inputs rows, text: max_text_tokens + 2 rows;
        # gpt/model.py:355-358) and jnp.take fills out-of-range gathers with
        # NaN — decoding past the table would corrupt the whole batch
        # silently.  EngineConfig defaults are sized for the shipped 24k
        # model; smaller models (tests) get the caps derived here.
        mel_cap = cfg.gpt.max_mel_tokens
        txt_cap = cfg.gpt.max_text_tokens
        engine_cfg = dataclasses.replace(
            engine_cfg,
            max_generate_length=min(engine_cfg.max_generate_length, mel_cap),
            text_buckets=tuple(
                b for b in engine_cfg.text_buckets if b < txt_cap
            ) + (txt_cap,) if engine_cfg.text_buckets[-1] > txt_cap
            else engine_cfg.text_buckets,
            code_buckets=tuple(
                b for b in engine_cfg.code_buckets if b <= mel_cap
            ) or (mel_cap,),
        )
        self.cfg = cfg
        self.ecfg = engine_cfg
        self.mesh = mesh
        self.model = SynthesizerTrn(cfg)
        cdt = engine_cfg.compute_dtype
        if cdt is not None:
            # bf16 weights halve the HBM weight traffic of the AR decode and
            # put the diffusion/vocoder matmuls on the fast MXU path; the VQ
            # codebook (vq_state) stays fp32 for distance math.
            params = jax.tree_util.tree_map(
                lambda p: p.astype(cdt)
                if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
                variables["params"])
            variables = dict(variables, params=params)
        if mesh is not None:
            from detail_tts_tpu.parallel.mesh import replicate_tree, shard_tree

            variables = {"params": shard_tree(variables["params"], mesh),
                         "vq_state": replicate_tree(variables["vq_state"],
                                                    mesh)}
        self._variables = variables
        self._cdt = cdt or jnp.float32
        self.frontend = MelFrontend(
            cfg.data.sampling_rate, cfg.data.filter_length,
            cfg.data.hop_length, cfg.data.win_length, cfg.data.n_mel_channels,
            cfg.data.mel_fmin, cfg.data.mel_fmax)
        sched_cfg = cfg
        if engine_cfg.diffusion_steps is not None:
            sched_cfg = dataclasses.replace(cfg, diffusion=dataclasses.replace(
                cfg.diffusion, infer_steps=engine_cfg.diffusion_steps))
        self.schedule = make_infer_schedule(sched_cfg)
        if tokenizer is None:
            tokenizer = make_tokenizer(cfg.data.tokenizer_vocab)
        self.tokenizer = tokenizer
        self._gpt = self.model.cfg.gpt  # GPTConfig shortcut

        # ------------------------- jitted stages (cached per input shape)
        ecfg = engine_cfg
        model = self.model
        gpt_module = UnifiedVoice(cfg.gpt)
        cdt_c = self._cdt

        @functools.partial(jax.jit, static_argnames=("max_len", "force_full"))
        def _generate(variables, cond_mel, cond_len, text, rng, max_len,
                      force_full=False):
            cond_mel = cond_mel.astype(cdt_c)
            sampling = SamplingConfig(
                temperature=ecfg.temperature, top_p=ecfg.top_p,
                repetition_penalty=ecfg.repetition_penalty,
                typical_mass=ecfg.typical_mass,
                max_generate_length=max_len, force_full_length=force_full)
            gpt_params = {"params": variables["params"]["gpt"]}
            return generate_speech_tokens(
                gpt_module, gpt_params, rng, cond_mel, cond_len, text,
                sampling=sampling, cache_dtype=ecfg.cache_dtype)

        @jax.jit
        def _latents(variables, cond_mel, cond_len, text, codes, wav_len):
            return model.apply(
                variables, cond_mel.astype(cdt_c), cond_len, text, None,
                codes, wav_len, return_latent=True, deterministic=True,
                method=lambda m, *a, **k: m.gpt(*a, **k))

        @jax.jit
        def _diff_cond(variables, refer_mel):
            """Prompt mel (B', L, 128) -> conditioning latent (B', 2*mc)."""
            return model.apply(variables, refer_mel.astype(cdt_c),
                               method=SynthesizerTrn.diffusion_conditioning)

        @functools.partial(jax.jit, static_argnames=("out_len",))
        def _attn_biases(variables, out_len):
            """13x (H, T, T) bf16 T5 biases (log2-domain).  ~1 GB of HBM
            writes at serving shapes — computed once per code bucket and
            cached across requests (they depend only on weights + length)."""
            biases = model.apply(variables, out_len,
                                 method=SynthesizerTrn.diffusion_attention_biases)
            return [b.astype(cdt_c) for b in biases]

        @jax.jit
        def _diffuse(variables, latents, cond_latent, biases, rng):
            """latents (B,Tc,768) + precomputed diffusion conditioning
            (B, 2*mc) + hoisted per-bucket attention biases
            -> denormalized mel (B,4Tc,128)."""
            out_len = latents.shape[1] * FRAMES_PER_CODE
            cond_latent = cond_latent.astype(cdt_c)
            code_emb = model.apply(
                variables, latents.astype(cdt_c), cond_latent,
                method=SynthesizerTrn.diffusion_code_embedding)

            def model_fn(x, t_orig, conditioning_free):
                if x.shape[0] == 2 * latents.shape[0]:
                    # CFG 2B call: uncond integrator deduped inside
                    return model.apply(variables, x.astype(cdt_c), t_orig,
                                       code_emb, biases,
                                       method=SynthesizerTrn.diffusion_cfg_step)
                if conditioning_free is None:
                    conditioning_free = jnp.zeros((x.shape[0],), bool)
                return model.apply(variables, x.astype(cdt_c), t_orig,
                                   code_emb, conditioning_free, biases,
                                   method=SynthesizerTrn.diffusion_step)

            n_rng, s_rng = jax.random.split(rng)
            noise = jax.random.normal(
                n_rng, (latents.shape[0], out_len, cfg.diffusion.in_channels),
                jnp.float32) * ecfg.diffusion_temperature
            if ecfg.diffusion_sampler == "ancestral":
                mel_norm = p_sample_loop(
                    self.schedule, model_fn, noise, s_rng,
                    cond_free_k=cfg.diffusion.cond_free_k,
                    conditioning_free=True)
            elif ecfg.diffusion_sampler == "ddim":
                from detail_tts_tpu.models.diffusion import ddim_sample_loop

                mel_norm = ddim_sample_loop(
                    self.schedule, model_fn, noise,
                    cond_free_k=cfg.diffusion.cond_free_k,
                    conditioning_free=True)
            elif ecfg.diffusion_sampler == "dpmpp_2m":
                # the reference's CONFIGURED sampler, matched exactly
                # (continuous linear NoiseScheduleVP + constant guidance +
                # time_uniform multistep-2, diffusion.py:487-581)
                from detail_tts_tpu.models.diffusion import (
                    dpmpp_2m_reference_sample_loop)

                mel_norm = dpmpp_2m_reference_sample_loop(
                    model_fn, noise, steps=self.schedule.num_timesteps,
                    guidance_scale=cfg.diffusion.cond_free_k)
            elif ecfg.diffusion_sampler == "dpmpp_2m_karras":
                from detail_tts_tpu.models.diffusion import dpmpp_2m_sample_loop

                mel_norm = dpmpp_2m_sample_loop(
                    self.schedule, model_fn, noise,
                    cond_free_k=cfg.diffusion.cond_free_k,
                    conditioning_free=True)
            else:
                raise ValueError(ecfg.diffusion_sampler)
            return denormalize_mel(mel_norm)

        @jax.jit
        def _vocode(variables, mel, lengths, rng):
            wav = model.apply(variables, mel.astype(cdt_c), lengths, rng,
                              noise_scale=ecfg.noise_scale,
                              method=SynthesizerTrn.infer_flowvae)
            if ecfg.pcm16_output:
                return jnp.round(jnp.clip(wav.astype(jnp.float32), -1, 1)
                                 * 32767.0).astype(jnp.int16)
            return wav.astype(jnp.float32)

        @jax.jit
        def _codes_to_mel(variables, codes, refer_mel, refer_len):
            mel = model.apply(variables, codes, refer_mel.astype(cdt_c),
                              refer_len, method=SynthesizerTrn.decode_codes_to_mel)
            return mel.astype(jnp.float32)

        @jax.jit
        def _vq_roundtrip(variables, mel, rng):
            return model.apply(variables, mel, rng,
                               method=SynthesizerTrn.infer_vqvae)

        @functools.partial(jax.jit, static_argnames=("bucket", "vq_safe"))
        def _pad_codes_dev(codes, eff, bucket, vq_safe=False):
            """Crop codes to ``bucket``, stop-fill past each length (device)."""
            c = codes[:, :bucket]
            pos = jnp.arange(bucket)[None, :]
            fill = self._gpt.stop_mel_token
            c = jnp.where(pos < eff[:, None], c, fill)
            if vq_safe:  # ids beyond the VQ codebook (start/stop) -> 0
                c = jnp.where(c < cfg.vaegan.vq_bins, c, 0)
            wav_len = (eff * self._gpt.mel_length_compression).astype(jnp.int32)
            return c, wav_len

        self._generate = _generate
        self._latents = _latents
        self._diff_cond = _diff_cond
        self._attn_biases = _attn_biases
        self._bias_cache: "OrderedDict[int, list]" = OrderedDict()
        self._diffuse = _diffuse
        self._vocode = _vocode
        self._codes_to_mel = _codes_to_mel
        self._vq_roundtrip = _vq_roundtrip
        self._pad_codes_dev = _pad_codes_dev

    # ------------------------------------------------------------- host prep

    def prepare_text(self, texts: Sequence[str]) -> Tuple[jnp.ndarray, np.ndarray]:
        """pinyin -> BPE -> right-pad with stop(0) to a shared text bucket."""
        cap = self.ecfg.text_buckets[-1] - 1
        encoded = [self.tokenizer.encode(to_pinyin(t))[:cap] for t in texts]
        lengths = np.array([len(e) for e in encoded], np.int32)
        max_len = _bucket_up(int(lengths.max()) + 1, self.ecfg.text_buckets)
        out = np.zeros((len(texts), max_len), np.int32)
        for i, e in enumerate(encoded):
            out[i, : len(e)] = e
        return jnp.asarray(out), lengths

    def prepare_prompt(self, wavs: Sequence[np.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """waveforms (24 kHz float) -> prompt mel padded UP to a bucket + true
        per-item lengths.

        Each item's effective prompt depends only on itself: items longer
        than the largest bucket are cropped to it, shorter ones keep their
        true length and are zero-padded (zero is the training-time pad value,
        reference collate dataset_24k.py:258-272).  The masked consumers
        (ref_enc/vq_ref_enc/GPT conditioning) are exactly padding-invariant;
        the unmasked diffusion conditioning is computed per item at its own
        bucket (``diffusion_cond``), so no request's audio depends on its
        batchmates.

        Mel extraction runs on host CPU with wavs zero-padded to a 0.5 s grid
        (bounds compile count; padded trailing frames are cropped away).
        """
        cpu = jax.local_devices(backend="cpu")[0]
        chunk = self.cfg.data.sampling_rate // 2
        cap = self.ecfg.prompt_buckets[-1]
        padded = []
        for i, w in enumerate(wavs):
            w = np.asarray(w, np.float32)
            n_true = w.shape[-1] // self.cfg.data.hop_length
            if n_true < 1:
                # a zero-length prompt would zero the style-pool mask and
                # silently produce NaN audio — fail loudly instead
                raise ValueError(
                    f"prompt wav {i} too short: {w.shape[-1]} samples "
                    f"(< one hop of {self.cfg.data.hop_length})")
            padded.append((np.pad(w, (0, (-len(w)) % chunk)),
                           min(n_true, cap)))
        mels: List[Optional[np.ndarray]] = [None] * len(wavs)
        with jax.default_device(cpu):
            # one batched STFT per distinct padded length (usually one)
            for plen in sorted({p.shape[-1] for p, _ in padded}):
                idx = [i for i, (p, _) in enumerate(padded)
                       if p.shape[-1] == plen]
                stack = np.stack([padded[i][0] for i in idx])
                batch_m = np.asarray(self.frontend.mel_spectrogram(
                    jnp.asarray(stack)))
                for j, i in enumerate(idx):
                    mels[i] = batch_m[j, : padded[i][1]]
        lengths = np.array([m.shape[0] for m in mels], np.int32)
        width = _bucket_up(int(lengths.max()), self.ecfg.prompt_buckets)
        out = np.zeros((len(wavs), width, mels[0].shape[1]), np.float32)
        for i, m in enumerate(mels):
            out[i, : m.shape[0]] = m
        return jnp.asarray(out), jnp.asarray(lengths)

    def diffusion_cond(self, refer_mel: jnp.ndarray, refer_len: jnp.ndarray
                       ) -> jnp.ndarray:
        """Per-item-deterministic diffusion conditioning latents (B, 2*mc).

        The reference's contextual embedder is unmasked (diff_model.py:221-229)
        and trains on zero-padded batch mels (model_24k.py:683), so trailing
        zeros are in-distribution — but their amount must not depend on the
        batch: each item is evaluated at its OWN bucket width.  Items sharing
        a bucket run as one batched call (the conditioning net is per-sample,
        so grouping only changes results by matmul tiling jitter ~1e-6); in
        the common all-same-bucket case this is a single dispatch.
        """
        t_max = refer_mel.shape[1]
        lens = np.asarray(refer_len)
        n = refer_mel.shape[0]
        buckets = [min(_bucket_up(int(lens[i]), self.ecfg.prompt_buckets),
                       t_max) for i in range(n)]
        out = [None] * n
        for lb in sorted(set(buckets)):
            idx = [i for i in range(n) if buckets[i] == lb]
            group = (refer_mel[:, :lb] if len(idx) == n
                     else jnp.take(refer_mel[:, :lb],
                                   jnp.asarray(idx, jnp.int32), axis=0))
            cond = self._diff_cond(self.variables, group)
            for j, i in enumerate(idx):
                out[i] = cond[j : j + 1]
        return out[0] if n == 1 else jnp.concatenate(out, axis=0)

    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, value):
        """Swapping weights (trainer eval) invalidates the bias cache."""
        self._variables = value
        self._bias_cache.clear()

    def attention_biases(self, out_len: int) -> list:
        """LRU-cached hoisted diffusion attention biases for ``out_len``."""
        cached = self._bias_cache.get(out_len)
        if cached is not None:
            self._bias_cache.move_to_end(out_len)
            return cached
        biases = self._attn_biases(self.variables, out_len)
        self._bias_cache[out_len] = biases
        while len(self._bias_cache) > max(self.ecfg.bias_cache_buckets, 1):
            self._bias_cache.popitem(last=False)
        return biases

    def _shard(self, *arrays):
        """Shard request arrays over the mesh's data axis (no-op w/o mesh)."""
        if self.mesh is None:
            return arrays
        from detail_tts_tpu.parallel.mesh import shard_batch

        return tuple(shard_batch(a, self.mesh) for a in arrays)

    # ------------------------------------------------------------ pipelines

    @staticmethod
    def _effective_lengths(n: int, lengths, max_len: int,
                           force_full: bool) -> np.ndarray:
        """Decoded-length vector with the HF-parity final-token drop applied
        (the reference always drops the last token: codes[:, :-1],
        model_24k.py:794).  Under ``force_full`` lengths are statically
        ``max_len``, so the host round-trip on ``lengths`` is skipped and
        downstream stages enqueue while the decode still runs on device."""
        if force_full:
            return np.full((n,), max(max_len - 1, 1), np.int32)
        return np.maximum(np.asarray(lengths) - 1, 1).astype(np.int32)

    def generate_codes(self, refer_mel, refer_len, text, rng,
                       force_full: bool = False,
                       max_len: Optional[int] = None):
        """AR decode; returns (codes (B,max_len), effective lengths (B,))."""
        max_len = max_len or self.ecfg.max_generate_length
        codes, lengths = self._generate(self.variables, refer_mel, refer_len,
                                        text, rng, max_len, force_full)
        eff = self._effective_lengths(codes.shape[0], lengths, max_len,
                                      force_full)
        return codes, eff

    def _pad_codes(self, codes, eff, vq_safe: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        """Bucket + stop-fill on device (codes never round-trip the host;
        only the tiny ``eff`` vector crossed for bucket selection)."""
        # clamp: buckets may exceed the decoded width (max_generate_length)
        bucket = min(_bucket_up(int(eff.max()), self.ecfg.code_buckets),
                     codes.shape[1])
        codes_b, wav_len = self._pad_codes_dev(
            codes, jnp.asarray(eff, jnp.int32), bucket, vq_safe)
        return codes_b, wav_len, bucket

    def dispatch_batch(self, texts: Sequence[str],
                       prompt_wavs: Sequence[np.ndarray],
                       rng: Optional[jax.Array] = None,
                       force_full: bool = False,
                       timings: Optional[Dict[str, float]] = None
                       ) -> "InflightBatch":
        """Enqueue ALL device work for one batch; no output fetch.

        Returns an :class:`InflightBatch` handle — pass it to
        :meth:`finalize_batch` to fetch the wavs.  Splitting dispatch from
        finalize lets a server overlap batch N+1's host prep + dispatches
        with batch N's device execution (cross-batch pipelining): the only
        host blocking here is the decode-length sync (skipped under
        ``force_full``); the D2H transfer belongs to finalize.  Servers that
        must not charge that sync to the PREVIOUS batch's latency use the
        finer :meth:`dispatch_decode` / :meth:`dispatch_tail` split.
        """
        return self.dispatch_tail(self.dispatch_decode(
            texts, prompt_wavs, rng=rng, force_full=force_full,
            timings=timings))

    def dispatch_decode(self, texts: Sequence[str],
                        prompt_wavs: Sequence[np.ndarray],
                        rng: Optional[jax.Array] = None,
                        force_full: bool = False,
                        timings: Optional[Dict[str, float]] = None
                        ) -> "PendingDecode":
        """Phase 1: host prep + enqueue the AR decode and diffusion cond.

        No host sync on the decode output — returns immediately after the
        dispatches, so a server can resolve the previous batch's futures
        while this batch's generate runs (see :class:`PendingDecode`)."""
        import time as _time

        t0 = _time.perf_counter()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        g_rng, d_rng, v_rng = jax.random.split(rng, 3)
        text, _ = self.prepare_text(texts)
        refer_mel, refer_len = self.prepare_prompt(prompt_wavs)
        if timings is not None:
            jax.device_get(refer_mel.ravel()[0])  # force real completion
            now = _time.perf_counter()
            timings["prepare"] = timings.get("prepare", 0.0) + (now - t0)
            t0 = now
        text, refer_mel, refer_len = self._shard(text, refer_mel, refer_len)

        # dispatch the AR decode first: diffusion_cond's host-side grouping
        # and dispatches then overlap the ~0.7 s of device decode time
        max_len = self.ecfg.max_generate_length
        codes, lengths = self._generate(self.variables, refer_mel, refer_len,
                                        text, g_rng, max_len, force_full)
        diff_cond = self.diffusion_cond(refer_mel, refer_len)
        (diff_cond,) = self._shard(diff_cond)
        return PendingDecode(codes=codes,
                             lengths=None if force_full else lengths,
                             diff_cond=diff_cond, refer_mel=refer_mel,
                             refer_len=refer_len, text=text, d_rng=d_rng,
                             v_rng=v_rng, n=len(texts), max_len=max_len,
                             force_full=force_full, timings=timings, _t0=t0)

    def dispatch_tail(self, pending: "PendingDecode") -> "InflightBatch":
        """Phase 2: decode-length sync + bucket/pad + latents/diffuse/vocode.

        The ``eff`` sync here blocks until the decode finishes on device
        (unless the decode ran ``force_full``)."""
        import time as _time

        t0 = pending._t0
        timings = pending.timings
        if timings is not None:
            # Host work a caller did between dispatch_decode and
            # dispatch_tail (e.g. the server finalizing the previous batch)
            # is charged to its own bucket, not to 'generate'.
            now = _time.perf_counter()
            timings["gap"] = timings.get("gap", 0.0) + (now - t0)
            t0 = now

        def tick(name, out=None):
            nonlocal t0
            if timings is None:
                return
            if out is not None:
                jax.device_get(out.ravel()[0])  # force real completion
            now = _time.perf_counter()
            timings[name] = timings.get(name, 0.0) + (now - t0)
            t0 = now

        codes = pending.codes
        eff = self._effective_lengths(codes.shape[0], pending.lengths,
                                      pending.max_len, pending.force_full)
        tick("generate", codes)
        tick("diff_cond", pending.diff_cond)
        codes_b, wav_len, bucket = self._pad_codes(codes, eff)

        latents = self._latents(self.variables, pending.refer_mel,
                                pending.refer_len, pending.text,
                                codes_b, wav_len)
        tick("latents", latents)
        biases = self.attention_biases(bucket * FRAMES_PER_CODE)
        mel = self._diffuse(self.variables, latents, pending.diff_cond,
                            biases, pending.d_rng)
        tick("diffuse", mel)
        mel_lengths = jnp.asarray(eff * FRAMES_PER_CODE, jnp.int32)
        wav = self._vocode(self.variables, mel, mel_lengths, pending.v_rng)
        tick("vocode", wav)
        return InflightBatch(wav=wav, eff=eff, n=pending.n,
                             timings=timings, _t0=t0)

    def finalize_batch(self, inflight: "InflightBatch") -> List[np.ndarray]:
        """Fetch + trim an :meth:`dispatch_batch` handle (blocks on D2H)."""
        import time as _time

        wav = np.asarray(inflight.wav[..., 0])
        hop_per_code = self._gpt.mel_length_compression
        outs = [wav[i, : int(inflight.eff[i]) * hop_per_code]
                for i in range(inflight.n)]
        if inflight.timings is not None:
            now = _time.perf_counter()
            inflight.timings["host"] = (inflight.timings.get("host", 0.0)
                                        + (now - inflight._t0))
        return outs

    def synthesize_batch(self, texts: Sequence[str],
                         prompt_wavs: Sequence[np.ndarray],
                         rng: Optional[jax.Array] = None,
                         force_full: bool = False,
                         timings: Optional[Dict[str, float]] = None
                         ) -> List[np.ndarray]:
        """Full pipeline (reference ``infer``, model_24k.py:774-810).

        ``timings``: optional dict — when given, each stage is synced
        (``jax.device_get`` of one element; ``block_until_ready`` can return
        early over the axon tunnel) and its wall time accumulated under its
        name.  This is the shipped per-stage profiler (``bench.py --stages``).
        """
        return self.finalize_batch(self.dispatch_batch(
            texts, prompt_wavs, rng=rng, force_full=force_full,
            timings=timings))

    def synthesize(self, text: str, prompt_wav: np.ndarray,
                   rng: Optional[jax.Array] = None) -> np.ndarray:
        """Single-utterance convenience (the api.py surface)."""
        return self.synthesize_batch([text], [prompt_wav], rng)[0]

    def synthesize_from_ids(self, text_ids: jnp.ndarray,
                            refer_mel: jnp.ndarray, refer_len: jnp.ndarray,
                            rng: jax.Array, vq_only: bool = False
                            ) -> List[np.ndarray]:
        """Low-level entry on pre-tokenized ids + prompt mel (trainer eval).

        Mirrors the reference's eval-time ``infer_gpt`` (vq_only) / ``infer``
        calls on raw batch tensors (train.py:234-236).
        """
        g_rng, d_rng, v_rng = jax.random.split(rng, 3)
        codes, eff = self.generate_codes(refer_mel, refer_len, text_ids, g_rng)
        codes_b, wav_len, bucket = self._pad_codes(codes, eff, vq_safe=vq_only)
        if vq_only:
            mel = self._codes_to_mel(self.variables, codes_b, refer_mel,
                                     refer_len)
        else:
            latents = self._latents(self.variables, refer_mel, refer_len,
                                    text_ids, codes_b, wav_len)
            diff_cond = self.diffusion_cond(refer_mel, refer_len)
            biases = self.attention_biases(bucket * FRAMES_PER_CODE)
            mel = self._diffuse(self.variables, latents, diff_cond, biases,
                                d_rng)
        mel_lengths = jnp.asarray(eff * FRAMES_PER_CODE, jnp.int32)
        wav = np.asarray(self._vocode(self.variables, mel, mel_lengths,
                                      v_rng)[..., 0])
        hop_per_code = self._gpt.mel_length_compression
        return [wav[i, : int(eff[i]) * hop_per_code]
                for i in range(wav.shape[0])]

    def synthesize_vq_batch(self, texts: Sequence[str],
                            prompt_wavs: Sequence[np.ndarray],
                            rng: Optional[jax.Array] = None,
                            force_full: bool = False) -> List[np.ndarray]:
        """Diffusion-free path (reference ``infer_gpt``, model_24k.py:811-846)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        g_rng, v_rng = jax.random.split(rng)
        text, _ = self.prepare_text(texts)
        refer_mel, refer_len = self.prepare_prompt(prompt_wavs)
        text, refer_mel, refer_len = self._shard(text, refer_mel, refer_len)

        codes, eff = self.generate_codes(refer_mel, refer_len, text, g_rng,
                                         force_full=force_full)
        # vq_safe: GPT start/stop ids exceed the VQ codebook (8192/8193 vs
        # 8192 bins) and never index it in the reference's exact-length
        # batch-1 path — mapped (with the stop padding) to 0.
        codes_b, _, _ = self._pad_codes(codes, eff, vq_safe=True)
        mel = self._codes_to_mel(self.variables, codes_b, refer_mel, refer_len)
        mel_lengths = jnp.asarray(eff * FRAMES_PER_CODE, jnp.int32)
        wav = self._vocode(self.variables, mel, mel_lengths, v_rng)

        wav = np.asarray(wav[..., 0])
        hop_per_code = self._gpt.mel_length_compression
        return [wav[i, : int(eff[i]) * hop_per_code] for i in range(len(texts))]

    def vq_roundtrip(self, mel: jnp.ndarray, rng: Optional[jax.Array] = None):
        """mel -> codes -> mel -> wav (reference ``infer_vqvae``)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._vq_roundtrip(self.variables, mel, rng)

    def warmup(self, batch_size: int = 1, text_bucket: Optional[int] = None,
               prompt_bucket: Optional[int] = None,
               code_bucket: Optional[int] = None,
               force_full: bool = False) -> None:
        """Pre-compile one bucket combination with the PRODUCTION static args
        (max_len=ecfg.max_generate_length, force_full as served) so the first
        real request hits the jit cache."""
        tb = text_bucket or self.ecfg.text_buckets[0]
        pb = prompt_bucket or self.ecfg.prompt_buckets[0]
        cb = code_bucket or self.ecfg.code_buckets[0]
        rng = jax.random.PRNGKey(0)
        text = jnp.zeros((batch_size, tb), jnp.int32)
        refer = jnp.full((batch_size, pb, self.cfg.data.n_mel_channels), -6.0)
        refer_len = jnp.full((batch_size,), pb, jnp.int32)
        codes, lengths = self._generate(self.variables, refer, refer_len, text,
                                        rng, self.ecfg.max_generate_length,
                                        force_full)
        eff = np.full((batch_size,), min(cb, int(codes.shape[1])), np.int32)
        codes_b, wav_len, _ = self._pad_codes(codes, eff)
        latents = self._latents(self.variables, refer, refer_len, text,
                                codes_b, wav_len)
        diff_cond = self.diffusion_cond(refer, refer_len)
        biases = self.attention_biases(codes_b.shape[1] * FRAMES_PER_CODE)
        mel = self._diffuse(self.variables, latents, diff_cond, biases, rng)
        self._vocode(self.variables, mel,
                     jnp.asarray(eff * FRAMES_PER_CODE), rng)


def variables_template(cfg: Config) -> Any:
    """Abstract {'params','vq_state'} structure via eval_shape (no compute)."""
    from detail_tts_tpu.models.synthesizer import make_train_schedule
    from detail_tts_tpu.train.step import dummy_batch

    model = SynthesizerTrn(cfg)
    batch = dummy_batch(cfg, batch_size=1, mel_frames=48)
    schedule = make_train_schedule(cfg)

    def init_fn(rng):
        return model.init({"params": rng, "dropout": rng, "vq": rng},
                          batch, schedule, rng,
                          method=SynthesizerTrn.init_all)

    return jax.eval_shape(init_fn, jax.random.PRNGKey(0))


def fast_random_variables(cfg: Config, seed: int = 0, scale: float = 0.02) -> Any:
    """Random weights WITHOUT running an init forward (seconds, not minutes).

    Distributions are not the per-module init schemes — use only where weight
    values don't matter (benchmarks, compile checks).
    """
    template = variables_template(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, len(leaves))

    @jax.jit
    def make(keys):
        out = []
        for k, leaf in zip(keys, leaves):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * scale)
            elif leaf.dtype == jnp.bool_:
                out.append(jnp.ones(leaf.shape, leaf.dtype))
            else:
                out.append(jnp.zeros(leaf.shape, leaf.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, make(keys))


def random_engine(cfg: Optional[Config] = None, seed: int = 0,
                  engine_cfg: EngineConfig = EngineConfig(),
                  fast: bool = False) -> TTSEngine:
    """Engine with freshly-initialised (untrained) weights — for tests/bench."""
    from detail_tts_tpu.train.step import init_variables

    cfg = cfg or Config()
    model = SynthesizerTrn(cfg)
    if fast:
        variables = fast_random_variables(cfg, seed)
    else:
        variables = init_variables(model, cfg, jax.random.PRNGKey(seed),
                                   weight_norm=False)
    return TTSEngine(cfg, variables, engine_cfg)
