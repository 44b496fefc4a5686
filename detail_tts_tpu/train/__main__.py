"""Training CLI — the reference ``accelerate launch train.py`` equivalent.

Usage:
  python -m detail_tts_tpu.train --config vqvae/configs/config_24k.json \
      --data datasets/data.jsonl [--target gpt] [--resume logs/.../ckpt] \
      [--steps N] [--logs-folder logs]

Unlike the reference (hard-coded paths, train.py:462-465), every knob is a
flag; multi-host TPU slices need only ``jax.distributed.initialize`` (done
automatically when JAX detects a multi-host environment).
"""
from __future__ import annotations

import argparse
import dataclasses


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="reference-format JSON")
    p.add_argument("--data", required=True, help="jsonl with {path, text}")
    p.add_argument("--target", default=None,
                   choices=["vqvae", "gpt", "diff", "flowvae", "all"])
    p.add_argument("--resume", default=None, help="checkpoint dir to resume")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--logs-folder", default=None)
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args(argv)

    import os

    import jax

    # multi-host TPU slice: initialize the distributed runtime before any
    # backend use (SURVEY §2.4: replaces Accelerate's process-group init)
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    from detail_tts_tpu.config import Config
    from detail_tts_tpu.train.trainer import Trainer

    cfg = Config.from_json(args.config) if args.config else Config()
    if args.target:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, target=args.target))

    trainer = Trainer(cfg, logs_folder=args.logs_folder)
    trainer.default_data(args.data, num_threads=args.num_workers)
    if args.resume:
        trainer.load(args.resume)
    trainer.train(max_steps=args.steps)


if __name__ == "__main__":
    main()
