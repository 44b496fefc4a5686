"""Offline data-prep demo — the full reference prepare/ flow as a script.

Runs every phase end-to-end on a directory of raw recordings:
  1. VAD: split raw audio on silence into 0.7-30 s clips at 24 kHz
     (reference prepare/vad_process.py + 0_vad_asr_save_to_jsonl.py);
  2. transcripts -> jsonl: either a pluggable ASR callable or — shown
     here — the transcripts passthrough for corpora that already ship
     text (the reference hard-codes modelscope Paraformer-zh,
     prepare/asr_process.py:14-46, which is not installable everywhere);
  3. VQ extraction: jitted frozen-encoder codes saved beside each clip
     (prepare/extract_vq.py:18-46);
  4. sanity: stream one bucketed, padded training batch through
     JsonlTtsDataset/DataIterator to prove the prep output is trainable.

Run:  python examples/prepare_demo.py --in-dir raw/ --work-dir out/ \
          [--transcripts table.tsv] [--ckpt orbax_dir] [--cpu]

Without --transcripts every clip gets a placeholder transcript so the
pipeline still runs end-to-end (useful for smoke runs); without --ckpt
the VQ encoder uses random init (codes are valid indices, not meaningful).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in-dir", required=True, help="raw recordings (wav)")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--transcripts", default=None,
                   help="jsonl/tsv/'|' table of (clip path, text); "
                        "relative paths resolve against the clips dir")
    p.add_argument("--ckpt", default=None, help="Orbax checkpoint dir")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="small_test_config() model (smoke runs)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import glob

    import jax

    from detail_tts_tpu.config import Config, small_test_config
    from detail_tts_tpu.data.dataset import (BucketSpec, DataIterator,
                                             JsonlTtsDataset)
    from detail_tts_tpu.data.prepare import (extract_vq,
                                             load_transcript_table,
                                             transcripts_to_jsonl,
                                             vad_directory)
    from detail_tts_tpu.text.tokenizer import make_tokenizer

    cfg = small_test_config() if args.small else Config()
    sr = cfg.data.sampling_rate
    clips_dir = os.path.join(args.work_dir, "clips")
    jsonl = os.path.join(args.work_dir, "data.jsonl")
    os.makedirs(args.work_dir, exist_ok=True)

    # -- phase 1: VAD ------------------------------------------------------
    raw = sorted(glob.glob(os.path.join(args.in_dir, "**/*.wav"),
                           recursive=True))
    clips = vad_directory(raw, clips_dir, sr=sr, workers=1)
    print(f"[1/4] vad: {len(raw)} recordings -> {len(clips)} clips")

    # -- phase 2: transcripts -> jsonl ------------------------------------
    if args.transcripts:
        pairs = load_transcript_table(args.transcripts)
    else:  # placeholder text keeps the demo self-contained
        pairs = [(c, "你好世界，这是一条数据准备演示语句。") for c in clips]
    n = transcripts_to_jsonl(pairs, jsonl, clips_dir=clips_dir)
    print(f"[2/4] jsonl: {n} rows -> {jsonl}")

    # -- phase 3: VQ extraction -------------------------------------------
    if args.ckpt:
        from detail_tts_tpu.train.checkpoint import restore_variables

        variables = restore_variables(args.ckpt, cfg)
    else:
        from detail_tts_tpu.models.synthesizer import SynthesizerTrn
        from detail_tts_tpu.train.step import init_variables

        variables = init_variables(SynthesizerTrn(cfg), cfg,
                                   jax.random.PRNGKey(0), weight_norm=False)
    n = extract_vq(jsonl, cfg, variables)
    print(f"[3/4] vq: encoded {n} clips (.vq.npy beside each wav)")

    # -- phase 4: one training batch through the loader --------------------
    tok = make_tokenizer(cfg.data.tokenizer_vocab)
    ds = JsonlTtsDataset(cfg, jsonl, tok, shard=False)
    it = DataIterator(ds, micro_batch=min(2, len(ds)),
                      buckets=BucketSpec(), num_threads=1, seed=0)
    batch = next(iter(it))
    it.close()
    print("[4/4] batch:", {k: tuple(v.shape) for k, v in sorted(batch.items())})


if __name__ == "__main__":
    main()
