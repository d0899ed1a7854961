#!/usr/bin/env python
"""Convert a reference-format torch checkpoint directory to msig_tpu native.

    python tools/import_torch_checkpoint.py \\
        --torch_dir results_ref/.../epoch_180 --out results/.../epoch_180 \\
        [--style_dim 256] [--n_residual_blocks 8] [--image_size 256]

Reads ``checkpoint.pth`` (+ ``ema_checkpoint.pth`` when present), converts
all six networks + EMA copies via msig_tpu.compat, initializes fresh
optimizer states, and writes an Orbax checkpoint + meta.json that both the
trainer (--resume) and the inference CLI accept. Note both CLIs ALSO accept
the torch directory directly — this tool just makes the conversion explicit
and one-time.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--style_dim", type=int, default=256)
    ap.add_argument("--n_residual_blocks", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=256)
    args = ap.parse_args()

    import torch

    import jax

    from msig_tpu.config import TrainConfig
    from msig_tpu.train import Models, create_train_state
    from msig_tpu.train.checkpoint import resume_for_training, save_checkpoint

    ckpt = torch.load(f"{args.torch_dir}/checkpoint.pth", map_location="cpu",
                      weights_only=False)
    num_domains = int(ckpt.get("num_domains", 2))

    cfg = TrainConfig(
        image_size=args.image_size,
        style_dim=args.style_dim,
        n_residual_blocks=args.n_residual_blocks,
    )
    models = Models.from_config(cfg, num_domains)
    template = create_train_state(cfg, models, jax.random.PRNGKey(0))
    state, loss_history, start_epoch = resume_for_training(
        args.torch_dir, template, num_domains
    )
    if start_epoch == 0 and not loss_history:
        print("WARNING: no loss history in the torch checkpoint; epoch counter is 0")
    meta = {
        "num_domains": num_domains,
        "loss_history": loss_history,
        "image_size": args.image_size,
        "style_dim": args.style_dim,
        "n_residual_blocks": args.n_residual_blocks,
        "step": 0,
        "imported_from": args.torch_dir,
    }
    save_checkpoint(args.out, state, meta)
    print(json.dumps({"out": args.out, "num_domains": num_domains,
                      "resume_epoch": start_epoch}))


if __name__ == "__main__":
    main()
