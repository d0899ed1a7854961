#!/usr/bin/env python
"""Export an msig_tpu checkpoint as a reference-format torch checkpoint dir.

Writes ``checkpoint.pth`` + ``ema_checkpoint.pth`` that the reference's own
CLIs load directly (/root/reference/inference.py:19-77 prefers the EMA file;
``main.py --resume`` resumes from the pair, trainer.py:176-207) — the reverse
direction of tools/import_torch_checkpoint.py.

Usage:
    python tools/export_torch_checkpoint.py \
        --checkpoint_dir results/<exp>/checkpoints/epoch_N --out_dir /path/out \
        [--total_epochs 200] [--lr_g 2e-4] [--lr_d 1e-4]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint_dir", required=True, help="msig_tpu checkpoint (state/ + meta.json)")
    ap.add_argument("--out_dir", required=True, help="output torch checkpoint directory")
    ap.add_argument("--total_epochs", type=int, default=200,
                    help="T_max for the synthesized CosineAnnealingLR states")
    ap.add_argument("--lr_g", type=float, default=2e-4)
    ap.add_argument("--lr_d", type=float, default=1e-4)
    args = ap.parse_args(argv)

    import jax

    from msig_tpu.compat.torch_export import save_torch_checkpoint_dir
    from msig_tpu.config import TrainConfig
    from msig_tpu.train.checkpoint import load_meta, restore_checkpoint
    from msig_tpu.train.state import Models, create_train_state

    meta = load_meta(args.checkpoint_dir)
    if meta is None:
        print(f"No meta.json in {args.checkpoint_dir} — not an msig_tpu checkpoint", file=sys.stderr)
        return 1
    num_domains = int(meta["num_domains"])
    tcfg = TrainConfig(
        image_size=int(meta.get("image_size", 256)),
        style_dim=int(meta.get("style_dim", 256)),
        n_residual_blocks=int(meta.get("n_residual_blocks", 8)),
    )
    models = Models.from_config(tcfg, num_domains)
    template = create_train_state(tcfg, models, jax.random.PRNGKey(0))
    state, meta = restore_checkpoint(args.checkpoint_dir, template)
    if state is None:
        print(f"Checkpoint state not found in {args.checkpoint_dir}", file=sys.stderr)
        return 1
    loss_history = {k: [float(x) for x in v] for k, v in (meta.get("loss_history") or {}).items()}
    save_torch_checkpoint_dir(
        args.out_dir,
        jax.device_get(state.gen_params),
        jax.device_get(state.disc_params),
        jax.device_get(state.ema_params),
        num_domains=num_domains,
        style_dim=tcfg.style_dim,
        n_residual_blocks=tcfg.n_residual_blocks,
        loss_history=loss_history,
        lr_g=args.lr_g,
        lr_d=args.lr_d,
        total_epochs=args.total_epochs,
    )
    print(f"Exported reference-format checkpoint to {args.out_dir} "
          f"(num_domains={num_domains}, resume epoch {len(loss_history.get('G_loss', []))})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
