#!/usr/bin/env python
"""Export a portable fp16 demo checkpoint (EMA G_A2B + SE_B) from a full
training checkpoint.

The full Orbax train state is ~525 MB (6 nets + 4 EMA copies + 2 Adam
states); inference needs only the EMA generator and target-domain style
encoder, which fit in a ~31 MB float16 npz that can be version-controlled.
The export is loadable by the inference CLI directly
(msig_tpu/infer/loading.py layout 3):

    python inference.py --checkpoint_dir <out_dir> ...

Usage:
    python tools/export_demo_checkpoint.py --checkpoint results/<exp>/checkpoints/epoch_N \
        --out results/<exp>/demo_checkpoint [--note "..."]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import msig_tpu

msig_tpu.honor_jax_platforms_env()

from msig_tpu.config import InferenceConfig
from msig_tpu.infer.loading import DEMO_NPZ, load_inference_params


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}", out)
    else:
        out[prefix] = np.asarray(tree).astype(np.float16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="full checkpoint dir (orbax state/ or torch .pth)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--note", default="")
    ap.add_argument("--num_domains", type=int, default=10,
                    help="only needed for torch-format dirs (native meta.json "
                         "carries it); bundled dataset = 10")
    ap.add_argument("--style_dim", type=int, default=None)
    ap.add_argument("--n_residual_blocks", type=int, default=None)
    ap.add_argument("--image_size", type=int, default=None)
    args = ap.parse_args()

    overrides = {k: getattr(args, k) for k in
                 ("style_dim", "n_residual_blocks", "image_size")
                 if getattr(args, k) is not None}
    gen, se, meta, used_ema = load_inference_params(
        args.checkpoint, InferenceConfig(**overrides), num_domains=args.num_domains
    )
    flat = {}
    _flatten(gen, "gen", flat)
    _flatten(se, "se", flat)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, DEMO_NPZ), **flat)
    out_meta = {
        "ema": bool(used_ema),
        "num_domains": int(meta.get("num_domains", args.num_domains)),
        "epochs": meta.get("epochs"),
        "note": args.note or (
            "float16 EMA G_A2B + SE_B export; loadable by inference.py "
            "(--checkpoint_dir this dir)"),
    }
    for k in ("style_dim", "n_residual_blocks", "image_size"):
        v = meta.get(k, overrides.get(k))
        if v is not None:
            out_meta[k] = int(v)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(out_meta, f, indent=2)
    size = os.path.getsize(os.path.join(args.out, DEMO_NPZ)) / 1e6
    print(f"exported {len(flat)} tensors ({size:.1f} MB, ema={used_ema}) -> {args.out}")


if __name__ == "__main__":
    main()
