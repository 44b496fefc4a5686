"""Trainer + data pipeline + checkpoint round-trip on synthetic data."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detail_tts_tpu.config import small_test_config
from detail_tts_tpu.data.dataset import (BucketSpec, DataIterator,
                                         JsonlTtsDataset, collate, read_wav)
from detail_tts_tpu.text.tokenizer import CharTokenizer

pytestmark = pytest.mark.slow  # multi-minute tier; deselect with -m 'not slow'


def _make_dataset(tmp_path, n=4, secs=1.2, sr=24000):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        path = str(tmp_path / f"{i}.wav")
        wav = (rng.uniform(-0.3, 0.3, int(secs * sr)) * 32767).astype(np.int16)
        wavfile.write(path, sr, wav)
        rows.append({"path": path, "text": f"ce shi di {i} ju"})
    jsonl = str(tmp_path / "data.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return jsonl


def test_dataset_load_and_collate(tmp_path):
    cfg = small_test_config()
    jsonl = _make_dataset(tmp_path)
    ds = JsonlTtsDataset(cfg, jsonl, CharTokenizer(), shard=False)
    assert len(ds) == 4
    s = ds.load(0)
    assert s is not None
    assert s["spec"].shape[0] % 4 == 0
    assert s["spec"].shape == (s["mel"].shape[0], cfg.data.spec_channels)
    assert s["wav"].shape[0] == s["spec"].shape[0] * cfg.data.hop_length

    from detail_tts_tpu.data.dataset import _crop

    buckets = BucketSpec(crop_frames=96, crop_threshold=100,
                         raw_buckets=(128, 256), text_buckets=(32,))
    rng = np.random.default_rng(0)
    samples = [_crop(dict(s), buckets, rng, cfg.data.hop_length)
               for _ in range(2)]
    assert samples[0]["spec"].shape[0] == 96  # 112 > threshold -> cropped
    batch = collate(samples, buckets, cfg.data.hop_length,
                    cfg.data.spec_channels, cfg.data.n_mel_channels)
    assert batch["raw_mel"].shape[1] in (128, 256)
    assert batch["text"].shape[1] == 32
    assert batch["raw_spec_length"][0] == s["spec"].shape[0]


def test_data_iterator_shapes(tmp_path):
    cfg = small_test_config()
    jsonl = _make_dataset(tmp_path)
    ds = JsonlTtsDataset(cfg, jsonl, CharTokenizer(), shard=False)
    buckets = BucketSpec(crop_frames=96, crop_threshold=100,
                         raw_buckets=(128,), text_buckets=(32,))
    it = DataIterator(ds, micro_batch=2, accum=2, buckets=buckets,
                      num_threads=2, prefetch=2)
    batch = next(it)
    it.close()
    assert batch["mel"].shape[:2] == (2, 2)
    assert batch["raw_mel"].shape == (2, 2, 128, cfg.data.n_mel_channels)
    assert batch["text"].shape == (2, 2, 32)


def test_trainer_steps_and_checkpoint(tmp_path):
    cfg = small_test_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, target="vqvae",
                                  gradient_accumulate_every=2, batch_size=2,
                                  val_freq=2, save_freq=2))
    jsonl = _make_dataset(tmp_path)
    from detail_tts_tpu.train.trainer import Trainer

    buckets = BucketSpec(crop_frames=96, crop_threshold=100,
                         raw_buckets=(128,), text_buckets=(32,))
    tr = Trainer(cfg, logs_folder=str(tmp_path / "logs"), buckets=buckets,
                 mesh=None)
    tr.default_data(jsonl, num_threads=2)
    prof_dir = str(tmp_path / "prof")
    metrics = tr.train(max_steps=2, log_every=1, profile_dir=prof_dir,
                       profile_steps=(0, 1))
    tr.data_iter.close()
    assert np.isfinite(metrics["loss"])
    assert int(tr.state.step) == 2
    # jax.profiler trace written (SURVEY §5 tracing hook)
    import glob
    assert glob.glob(os.path.join(prof_dir, "**", "*.trace.json.gz"),
                     recursive=True)
    # eval wav + checkpoint written
    assert os.path.exists(str(tmp_path / "logs" / "sample-1.wav"))
    ckpt_dir = str(tmp_path / "logs" / "ckpt")
    assert os.path.isdir(ckpt_dir)

    # restore into a fresh trainer
    tr2 = Trainer(cfg, logs_folder=str(tmp_path / "logs2"), buckets=buckets)
    tr2.load(ckpt_dir)
    assert int(tr2.state.step) == 2
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trainer_synth_eval_gpt(tmp_path):
    """gpt target + synth_eval: eval runs the full infer_gpt pipeline."""
    cfg = small_test_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, target="gpt",
                                  gradient_accumulate_every=1, batch_size=2,
                                  val_freq=1, save_freq=100))
    jsonl = _make_dataset(tmp_path)
    from detail_tts_tpu.train.trainer import Trainer

    buckets = BucketSpec(crop_frames=96, crop_threshold=100,
                         raw_buckets=(128,), text_buckets=(32,))
    tr = Trainer(cfg, logs_folder=str(tmp_path / "logs"), buckets=buckets,
                 synth_eval=True)
    tr.default_data(jsonl, num_threads=2)
    tr.train(max_steps=1, log_every=1)
    tr.data_iter.close()
    assert os.path.exists(str(tmp_path / "logs" / "sample-0.wav"))


def test_synth_eval_tracks_weight_updates(tmp_path):
    """Guard against a stale-engine regression: ``_run_synth_eval`` reuses
    one cached TTSEngine across evals and swaps ``variables`` in — if the
    swap (or its bias-cache invalidation) silently broke, evals would dump
    stale-weight audio forever and today's tests would still pass."""
    cfg = small_test_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, target="gpt",
                                  gradient_accumulate_every=1, batch_size=2,
                                  val_freq=100, save_freq=100))
    jsonl = _make_dataset(tmp_path)
    from detail_tts_tpu.train.trainer import Trainer

    buckets = BucketSpec(crop_frames=96, crop_threshold=100,
                         raw_buckets=(128,), text_buckets=(32,))
    tr = Trainer(cfg, logs_folder=str(tmp_path / "logs"), buckets=buckets,
                 synth_eval=True)
    tr.default_data(jsonl, num_threads=2)
    batch = next(tr.data_iter)
    tr.data_iter.close()

    def first(key):
        v = np.asarray(jax.device_get(batch[key]))[0]  # drop accum axis
        return v[:1]

    rng = jax.random.PRNGKey(7)
    # a from-scratch gpt-target trainer still has the ZERO vq codebook
    # (k-means init only runs on a vqvae train batch) — decode would map
    # every code to the same vector and hide weight changes; give it
    # non-trivial content like the parity fixtures do
    vq_state = jax.tree_util.tree_map(lambda x: x, tr.state.vq_state)
    cb = vq_state["quantizer"]["layer_0"]["codebook"]
    cb["embed"] = jax.random.normal(jax.random.PRNGKey(1), cb["embed"].shape)
    cb["embed_avg"] = cb["embed"]
    cb["cluster_size"] = jnp.ones_like(cb["cluster_size"])
    cb["inited"] = jnp.ones((), bool)

    vars0 = {"params": tr.state.params, "vq_state": vq_state}
    wav0 = np.asarray(tr._run_synth_eval(vars0, first, rng)[0])
    # determinism baseline: same variables + rng -> identical audio
    wav0b = np.asarray(tr._run_synth_eval(vars0, first, rng)[0])
    np.testing.assert_array_equal(wav0, wav0b)

    # simulate trained weights with an unmissable change to the GPT head:
    # +20 logit bias on one code id makes sampling deterministic-ish toward
    # it (a sign-flipped kernel is NOT enough — at random init the head
    # logits are bias-dominated and top-p sampling picks identical tokens)
    params1 = jax.tree_util.tree_map(lambda x: x, tr.state.params)
    params1["gpt"]["mel_head"]["dense"]["bias"] = (
        params1["gpt"]["mel_head"]["dense"]["bias"].at[42].add(20.0))
    vars1 = {"params": params1, "vq_state": vq_state}
    wav1 = np.asarray(tr._run_synth_eval(vars1, first, rng)[0])
    assert (wav0.shape != wav1.shape
            or not np.allclose(wav0, wav1)), "eval reused stale weights"


def test_metrics_logger_media(tmp_path):
    """TB media parity (reference summarize, log_utils.py:31-64): mel images
    + audio reach the event file; mel_to_image output is well-formed."""
    from detail_tts_tpu.train.trainer import MetricsLogger, mel_to_image

    mel = np.linspace(-11.5, 2.7, 40 * 8, dtype=np.float32).reshape(40, 8)
    img = mel_to_image(mel)
    assert img.shape == (3, 8, 40) and img.dtype == np.uint8
    assert img.max() > img.min()  # non-degenerate colormap

    logdir = str(tmp_path / "tb")
    logger = MetricsLogger(logdir)
    logger.log(1, {"loss": 1.0})
    logger.log_media(1, mels={"mel/gt": mel},
                     audios={"audio/gt": np.zeros(2400, np.float32)}, sr=24000)
    logger.close()
    if logger.tb is not None:
        events = [f for f in os.listdir(logdir) if "tfevents" in f]
        assert events, "no TB event file written"
        assert sum(os.path.getsize(os.path.join(logdir, f))
                   for f in events) > 2000  # image+audio payload present
