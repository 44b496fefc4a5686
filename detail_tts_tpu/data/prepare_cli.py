"""Data-prep CLI (reference prepare/ scripts, argparse-driven).

  python -m detail_tts_tpu.data.prepare_cli vad --in-dir raw/ --out-dir clips/
  python -m detail_tts_tpu.data.prepare_cli extract-vq --jsonl data.jsonl \
      --ckpt logs/.../ckpt [--config config.json]

ASR (phase 2) needs an engine; pass a python entry point exposing
``transcribe(wav: np.ndarray, sr: int) -> str``:

  python -m detail_tts_tpu.data.prepare_cli asr --clips-dir clips/ \
      --jsonl data.jsonl --recognizer mypkg.myasr

Corpora that already ship transcripts skip ASR with the passthrough
(see examples/prepare_demo.py for the full offline flow):

  python -m detail_tts_tpu.data.prepare_cli transcripts \
      --table metadata.tsv --jsonl data.jsonl [--clips-dir clips/]
"""
from __future__ import annotations

import argparse
import glob
import importlib
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("vad")
    v.add_argument("--in-dir", required=True)
    v.add_argument("--out-dir", required=True)
    v.add_argument("--sr", type=int, default=24000)
    v.add_argument("--workers", type=int, default=12)
    v.add_argument("--silence-db", type=float, default=-40.0)
    v.add_argument("--min-silence-ms", type=int, default=500)

    a = sub.add_parser("asr")
    a.add_argument("--clips-dir", required=True)
    a.add_argument("--jsonl", required=True)
    a.add_argument("--recognizer", required=True,
                   help="module with transcribe(wav, sr) -> str")
    a.add_argument("--workers", type=int, default=4)

    t = sub.add_parser("transcripts",
                       help="passthrough: pre-existing transcripts -> jsonl "
                            "(skips ASR; jsonl/tsv/LJSpeech '|' tables)")
    t.add_argument("--table", required=True)
    t.add_argument("--jsonl", required=True)
    t.add_argument("--clips-dir", default=None,
                   help="base dir for relative paths in the table")

    e = sub.add_parser("extract-vq")
    e.add_argument("--jsonl", required=True)
    e.add_argument("--ckpt", required=True)
    e.add_argument("--config", default=None)

    args = p.parse_args(argv)

    if args.cmd == "vad":
        from detail_tts_tpu.data.prepare import vad_directory

        paths = sorted(
            q for ext in ("wav", "flac", "mp3")
            for q in glob.glob(os.path.join(args.in_dir, f"**/*.{ext}"),
                               recursive=True))
        written = vad_directory(paths, args.out_dir, sr=args.sr,
                                workers=args.workers,
                                silence_thresh_db=args.silence_db,
                                min_silence_ms=args.min_silence_ms)
        print(f"wrote {len(written)} clips from {len(paths)} files")
    elif args.cmd == "asr":
        from detail_tts_tpu.data.prepare import asr_to_jsonl

        mod = importlib.import_module(args.recognizer)
        clips = sorted(glob.glob(os.path.join(args.clips_dir, "*.wav")))
        n = asr_to_jsonl(clips, args.jsonl, mod.transcribe,
                         workers=args.workers)
        print(f"wrote {n} rows to {args.jsonl}")
    elif args.cmd == "transcripts":
        from detail_tts_tpu.data.prepare import (load_transcript_table,
                                                 transcripts_to_jsonl)

        n = transcripts_to_jsonl(load_transcript_table(args.table),
                                 args.jsonl, clips_dir=args.clips_dir)
        print(f"wrote {n} rows to {args.jsonl}")
    elif args.cmd == "extract-vq":
        from detail_tts_tpu.config import Config
        from detail_tts_tpu.data.prepare import extract_vq
        from detail_tts_tpu.train.checkpoint import restore_variables

        cfg = Config.from_json(args.config) if args.config else Config()
        variables = restore_variables(args.ckpt, cfg)
        n = extract_vq(args.jsonl, cfg, variables)
        print(f"encoded {n} files")


if __name__ == "__main__":
    main()
