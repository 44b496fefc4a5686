"""Full-lifecycle demo — raw recordings to served speech in one script.

Chains the three workflows the other examples show in isolation, i.e. the
reference user's actual end-to-end path (prepare/ -> train.py -> api.py):
  1. prepare: VAD-split raw recordings into clips, transcripts -> jsonl
     (reference prepare/vad_process.py + 0_vad_asr_save_to_jsonl.py;
     ASR is pluggable — see examples/prepare_demo.py);
  2. staged training: a vqvae stage, then a gpt stage GROWN from the
     vqvae checkpoint (the reference's staged targets, train.py:132-175;
     grow-restore via train/checkpoint.py restore_checkpoint partial=True);
  3. serving: load the final Orbax checkpoint into TTSEngine (weight-norm
     folds on load) and synthesize a zero-shot utterance using one of the
     prepared clips as the voice prompt (reference api.py:21-50 flow).

Model/steps are demo-tiny by default so the whole lifecycle runs in
minutes on CPU; drop --small/--steps and pass --config for a real run.

Run:  python examples/lifecycle_demo.py --in-dir raw/ --work-dir out/ \
          [--transcripts table.tsv] [--steps N] [--cpu] [--small] [--vq-only]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in-dir", required=True, help="raw recordings (wav)")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--transcripts", default=None,
                   help="jsonl/tsv/'|' table of (clip path, text)")
    p.add_argument("--steps", type=int, default=2,
                   help="training steps PER STAGE (demo-tiny default)")
    p.add_argument("--text", default="ni3 hao3 shi4 jie4 .",
                   help="text to synthesize in the serving phase")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="small_test_config() model (smoke runs)")
    p.add_argument("--vq-only", action="store_true",
                   help="serve via the diffusion-free VQ path (faster)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import glob

    import jax
    import numpy as np

    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.data.dataset import BucketSpec, read_wav
    from detail_tts_tpu.data.prepare import (load_transcript_table,
                                             transcripts_to_jsonl,
                                             vad_directory)
    from detail_tts_tpu.train.trainer import Trainer

    cfg = small_test_config() if args.small else Config()
    sr = cfg.data.sampling_rate
    work = args.work_dir
    clips_dir = os.path.join(work, "clips")
    jsonl = os.path.join(work, "data.jsonl")
    os.makedirs(work, exist_ok=True)

    # -- phase 1: prepare (VAD -> clips -> jsonl) --------------------------
    raw = sorted(glob.glob(os.path.join(args.in_dir, "**/*.wav"),
                           recursive=True))
    clips = vad_directory(raw, clips_dir, sr=sr, workers=1)
    if args.transcripts:
        pairs = load_transcript_table(args.transcripts)
    else:  # placeholder text keeps the demo self-contained (Chinese: the
        # jsonl row filter drops latin text, like the reference ASR phase)
        pairs = [(c, "你好世界，准备演示。") for c in clips]
    n = transcripts_to_jsonl(pairs, jsonl, clips_dir=clips_dir)
    print(f"[1/4] prepare: {len(raw)} recordings -> {len(clips)} clips "
          f"-> {n} jsonl rows -> {jsonl}")

    # demo-sized crops/buckets (the defaults are sized for the 24k corpus)
    buckets = (BucketSpec(crop_frames=96, crop_threshold=100,
                          raw_buckets=(128, 256, 512), text_buckets=(32,))
               if args.small else None)

    def stage(target, prev_ckpt, max_steps):
        scfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, target=target, batch_size=2,
                gradient_accumulate_every=1, save_freq=args.steps,
                val_freq=10 ** 9))
        tr = Trainer(scfg, logs_folder=os.path.join(work, f"train_{target}"),
                     buckets=buckets, mesh=None)
        tr.default_data(jsonl, num_threads=1)
        if prev_ckpt:  # grow the next stage from the previous stage's ckpt
            tr.load(prev_ckpt)
        metrics = tr.train(max_steps=max_steps, log_every=1)
        tr.data_iter.close()
        assert int(tr.state.step) == max_steps
        return os.path.join(work, f"train_{target}", "ckpt"), metrics

    # -- phase 2: train the vqvae stage ------------------------------------
    ck1, m1 = stage("vqvae", None, args.steps)
    print(f"[2/4] train vqvae: {args.steps} steps, "
          f"loss={m1['loss']:.4f} -> {ck1}")

    # -- phase 3: grow the gpt stage from the vqvae checkpoint -------------
    ck2, m2 = stage("gpt", ck1, 2 * args.steps)
    print(f"[3/4] train gpt (grown from vqvae ckpt): {args.steps} steps, "
          f"loss={m2['loss']:.4f} -> {ck2}")

    # -- phase 4: serve from the trained checkpoint ------------------------
    from detail_tts_tpu.serving.api import save_wav
    from detail_tts_tpu.serving.pipeline import EngineConfig, TTSEngine
    from detail_tts_tpu.train.checkpoint import restore_variables

    variables = restore_variables(ck2, cfg)  # folds weight-norm for serving
    ecfg = (EngineConfig(max_generate_length=8, text_buckets=(16,),
                         prompt_buckets=(32,), code_buckets=(8,))
            if args.small else EngineConfig())
    eng = TTSEngine(cfg, variables, engine_cfg=ecfg)
    prompt = read_wav(clips[0], sr)
    rng = jax.random.PRNGKey(0)
    if args.vq_only:
        wav = eng.synthesize_vq_batch([args.text], [prompt], rng=rng)[0]
    else:
        wav = eng.synthesize(args.text, prompt, rng=rng)
    out = os.path.join(work, "lifecycle.wav")
    save_wav(out, np.asarray(wav), sr)
    print(f"[4/4] serve: wrote {out}: {len(wav) / sr:.2f}s @ {sr} Hz")


if __name__ == "__main__":
    main()
