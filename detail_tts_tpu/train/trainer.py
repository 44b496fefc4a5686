"""Staged trainer: the reference ``Trainer`` (train.py:80-465), TPU-native.

Drives the jitted step functions from ``train/step.py`` over a device mesh:

* targets {vqvae, gpt, diff}: grad-accum scan step;
* targets {flowvae, all}: two-phase GAN step;
* Orbax checkpoints every ``save_freq`` with keep-N GC;
* metrics to ``metrics.jsonl`` (+ TensorBoard when available);
* eval wav dumps every ``val_freq`` (sample-*.wav / gt-*.wav beside the
  checkpoints, like train.py:229-258);
* under SPMD there are no barriers and no rank guards — every process runs
  the same program, host 0 does the file IO.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detail_tts_tpu.config import Config
from detail_tts_tpu.data.dataset import (BucketSpec, DataIterator,
                                         JsonlTtsDataset)
from detail_tts_tpu.models.synthesizer import SynthesizerTrn
from detail_tts_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                          shard_batch, shard_tree)
from detail_tts_tpu.text.tokenizer import make_tokenizer
from detail_tts_tpu.train import checkpoint as ckpt_lib
from detail_tts_tpu.train.step import (GAN_TARGETS, make_train_state,
                                       make_train_step, stack_microbatches)


def _is_host0() -> bool:
    return jax.process_index() == 0


def mel_to_image(mel: np.ndarray) -> np.ndarray:
    """(T, n_mels) log-mel -> (3, n_mels, T) uint8 spectrogram image.

    Matplotlib-free equivalent of the reference's
    ``plot_spectrogram_to_numpy`` (log_utils.py:41-55): per-image min/max
    normalisation mapped through a compact viridis ramp, low bins at the
    bottom (origin='lower').
    """
    m = np.asarray(mel, np.float32).T  # (n_mels, T)
    lo, hi = float(m.min()), float(m.max())
    x = (m - lo) / max(hi - lo, 1e-6)
    ramp = np.array([[68, 1, 84], [59, 82, 139], [33, 145, 140],
                     [94, 201, 98], [253, 231, 37]], np.float32)  # viridis
    idx = x * (len(ramp) - 1)
    i0 = np.clip(idx.astype(np.int32), 0, len(ramp) - 2)
    frac = (idx - i0)[..., None]
    rgb = ramp[i0] * (1 - frac) + ramp[i0 + 1] * frac
    return np.flipud(rgb).transpose(2, 0, 1).astype(np.uint8)


class MetricsLogger:
    """jsonl + optional TensorBoard (scalars, mel images, audio).

    Media mirrors the reference's TB ``summarize`` usage (log_utils.py:31-39,
    train.py:416-439): gt/generated mel figures and gt/pred audio clips.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self.tb = SummaryWriter(log_dir=logdir)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self.tb.add_scalar(k, v, step)

    def log_media(self, step: int,
                  mels: Optional[Dict[str, np.ndarray]] = None,
                  audios: Optional[Dict[str, np.ndarray]] = None,
                  sr: int = 24000) -> None:
        """mels: {tag: (T, n_mels) log-mel}; audios: {tag: (N,) float wav}."""
        if self.tb is None:
            return
        for tag, mel in (mels or {}).items():
            self.tb.add_image(tag, mel_to_image(mel), step)
        for tag, wav in (audios or {}).items():
            wav = np.clip(np.asarray(wav, np.float32).reshape(-1), -1, 1)
            self.tb.add_audio(tag, wav[None], step, sample_rate=sr)

    def close(self) -> None:
        self._f.close()
        if self.tb is not None:
            self.tb.close()


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    from scipy.io import wavfile

    wavfile.write(path, sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))


class Trainer:
    def __init__(self, cfg: Config | str, data_iter: Optional[Iterator] = None,
                 logs_folder: Optional[str] = None, mesh=None, seed: int = 0,
                 buckets: BucketSpec = BucketSpec(),
                 synth_eval: bool = False):
        """``synth_eval``: for targets gpt/diff, run full synthesis at every
        val_freq like the reference (train.py:229-240) — compiles the AR
        decode + diffusion pipeline inside training, so it is opt-in."""
        if isinstance(cfg, str):
            cfg = Config.from_json(cfg)
        self.cfg = cfg
        self.target = cfg.train.target
        self.logs_folder = logs_folder or os.path.join(
            cfg.train.logs_folder, time.strftime("%Y-%m-%d-%H-%M-%S"))
        self.mesh = mesh if mesh is not None else make_mesh(
            data=cfg.mesh.data_parallel, model=cfg.mesh.model_parallel)

        rng = jax.random.PRNGKey(cfg.train.seed)
        self._rng, init_rng = jax.random.split(jax.random.fold_in(rng, seed))
        if cfg.train.rng_impl != "threefry2x32":
            # step-loop key only (dropout/noise draws): param init stays on
            # threefry so init is bit-stable across rng_impl settings.
            self._rng = jax.random.key(cfg.train.seed * 1000003 + seed,
                                       impl=cfg.train.rng_impl)
        self.state, self.model, self.disc = make_train_state(cfg, init_rng)
        self.state = self._shard_state(self.state)
        self.step_fn = make_train_step(self.model, self.disc, cfg)
        self.data_iter = data_iter
        self.buckets = buckets
        self.metrics = MetricsLogger(self.logs_folder) if _is_host0() else None
        self.synth_eval = synth_eval
        self._engine = None

    # ------------------------------------------------------------- plumbing

    def _shard_state(self, state):
        return state.replace(
            params=shard_tree(state.params, self.mesh),
            opt_state=shard_tree(state.opt_state, self.mesh),
            vq_state=replicate_tree(state.vq_state, self.mesh),
            d_params=(None if state.d_params is None
                      else replicate_tree(state.d_params, self.mesh)),
            d_opt_state=(None if state.d_opt_state is None
                         else replicate_tree(state.d_opt_state, self.mesh)),
        )

    def default_data(self, jsonl_path: str, num_threads: int = 8):
        tok = make_tokenizer(self.cfg.data.tokenizer_vocab)
        ds = JsonlTtsDataset(self.cfg, jsonl_path, tok)
        accum = (self.cfg.train.gradient_accumulate_every
                 if self.target not in GAN_TARGETS else 1)
        self.data_iter = DataIterator(ds, self.cfg.train.batch_size,
                                      accum=accum, buckets=self.buckets,
                                      num_threads=num_threads)
        return self

    # ----------------------------------------------------------- checkpoint

    def save(self) -> None:
        # EVERY process must enter the Orbax save (sharded-array gather is
        # collective; gating on host 0 deadlocks or truncates multi-host
        # checkpoints).  Only ancillary file IO (metrics, wav dumps) is
        # host-0-gated elsewhere.
        ckpt_lib.save_checkpoint(
            os.path.join(self.logs_folder, "ckpt"), self.state,
            int(self.state.step), keep=self.cfg.train.keep_ckpts)

    def load(self, ckpt_dir: str, step: Optional[int] = None) -> "Trainer":
        self.state = ckpt_lib.restore_checkpoint(ckpt_dir, self.state, step)
        self.state = self._shard_state(self.state)
        return self

    # ----------------------------------------------------------------- eval

    def _wn_ctx(self):
        from detail_tts_tpu.nn.common import weight_norm_reparam
        return (weight_norm_reparam() if self.cfg.train.weight_norm
                else contextlib.nullcontext())

    def _eval_dump(self, batch: Dict[str, np.ndarray]) -> None:
        """sample-*.wav / gt-*.wav every val_freq (train.py:229-258)."""
        if not _is_host0():
            return
        try:
            step = int(self.state.step)
            milestone = step // max(self.cfg.train.save_freq, 1)
            sr = self.cfg.data.sampling_rate

            def first(key):
                v = np.asarray(jax.device_get(batch[key]))
                if self.target not in GAN_TARGETS and v.ndim >= 2:
                    v = v[0]  # drop the accumulation axis
                return v[:1]

            variables = {"params": self.state.params,
                         "vq_state": self.state.vq_state}
            rng = jax.random.PRNGKey(step)
            # train params may carry the (g, v) reparam — applies on them
            # must trace under the same context as the step (nn/common.py)
            with self._wn_ctx():
                if self.target == "vqvae":
                    _, wav = self.model.apply(
                        variables, jnp.asarray(first("raw_mel")), rng,
                        method=SynthesizerTrn.infer_vqvae)
                elif self.target in ("gpt", "diff") and self.synth_eval:
                    # reference: gpt -> infer_gpt, diff -> infer
                    # (train.py:234-236)
                    wav = self._run_synth_eval(variables, first,
                                               rng)[0][None, :, None]
                    wav = jnp.asarray(wav)
                else:
                    wav = self.model.apply(
                        variables, jnp.asarray(first("raw_mel")),
                        jnp.asarray(first("raw_spec_length")), rng,
                        method=SynthesizerTrn.infer_flowvae)
            gen_wav = np.asarray(wav)[0, :, 0]
            gt_wav = first("raw_wav").reshape(-1)
            save_wav(os.path.join(self.logs_folder, f"sample-{milestone}.wav"),
                     gen_wav, sr)
            save_wav(os.path.join(self.logs_folder, f"gt-{milestone}.wav"),
                     gt_wav, sr)
            if self.metrics is not None:
                # TB media like the reference summarize (train.py:416-439)
                from detail_tts_tpu.audio.mel import MelFrontend

                d = self.cfg.data
                fe = MelFrontend(d.sampling_rate, d.filter_length,
                                 d.hop_length, d.win_length, d.n_mel_channels,
                                 d.mel_fmin, d.mel_fmax)
                gen_mel = np.asarray(fe.mel_spectrogram(
                    jnp.asarray(gen_wav)[None])[0])
                self.metrics.log_media(
                    step,
                    mels={"mel/gt": first("raw_mel")[0],
                          "mel/gen": gen_mel},
                    audios={"audio/gt": gt_wav, "audio/gen": gen_wav},
                    sr=sr)
        except Exception as e:  # eval must never kill training
            print(f"eval dump failed: {e}")

    def _run_synth_eval(self, variables, first, rng):
        from detail_tts_tpu.serving.pipeline import EngineConfig, TTSEngine

        # Own the (g, v) reparam context here, not only in _eval_dump: the
        # engine traces lazily per bucket shape, and every trace on TRAIN
        # params must see the same param structure the step used — a direct
        # caller (tests, notebooks) would otherwise hit
        # ScopeParamNotFoundError("kernel") on reparamed convs.
        with self._wn_ctx():
            if self._engine is None:
                self._engine = TTSEngine(self.cfg, variables,
                                         EngineConfig(max_generate_length=200,
                                                      compute_dtype=None))
            else:
                self._engine.variables = variables
            text = jnp.asarray(first("text"))
            mel = jnp.asarray(first("mel"))
            lengths = jnp.asarray(first("spec_length"))
            return self._engine.synthesize_from_ids(
                text, mel, lengths, rng, vq_only=(self.target == "gpt"))

    # ---------------------------------------------------------------- train

    def train(self, max_steps: Optional[int] = None,
              log_every: int = 10,
              profile_dir: Optional[str] = None,
              profile_steps: Tuple[int, int] = (3, 6)) -> Dict[str, float]:
        """``profile_dir``: write a jax.profiler trace of training steps
        [profile_steps[0], profile_steps[1]) — view with TensorBoard or
        scripts/parse_trace.py (SURVEY §5 tracing)."""
        assert self.data_iter is not None, "call default_data() or pass data_iter"
        cfg = self.cfg
        max_steps = max_steps or cfg.train.train_steps
        last_metrics: Dict[str, float] = {}
        t_last = time.perf_counter()
        profiling = False
        steps_seen = 0

        while int(self.state.step) < max_steps:
            if profile_dir is not None and _is_host0():
                if steps_seen == profile_steps[0] and not profiling:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                elif steps_seen == profile_steps[1] and profiling:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiling = False
            steps_seen += 1
            batch = next(self.data_iter)
            if self.target in GAN_TARGETS and _leading(batch) == 1:
                batch = {k: v[0] for k, v in batch.items()}  # no accum axis
            batch = shard_batch(
                batch, self.mesh,
                batch_axis=0 if self.target in GAN_TARGETS else 1)
            self._rng, key = jax.random.split(self._rng)
            self.state, metrics = self.step_fn(self.state, batch, key)
            step = int(self.state.step)

            if step % log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                metrics["steps_per_sec"] = log_every / dt
                last_metrics = metrics
                if self.metrics:
                    self.metrics.log(step, metrics)
            if step % cfg.train.val_freq == 0:
                self._eval_dump(batch)
            if step % cfg.train.save_freq == 0:
                self.save()
        if profiling:  # max_steps inside the profile window
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        return last_metrics


def _leading(batch) -> int:
    return jax.tree_util.tree_leaves(batch)[0].shape[0]
