#!/usr/bin/env python
"""FID between two image directories (e.g. generated outputs vs real target).

    python tools/evaluate_fid.py --dir_a output/... --dir_b data/ref/Domain \\
        [--image_size 256] [--vgg_weights vgg19_prefix.npz]

Without --vgg_weights the score is a PROXY FID (deterministic random VGG) —
self-consistent across runs of this framework, not comparable to published
InceptionV3 FID numbers. See msig_tpu/eval/fid.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir_a", required=True)
    ap.add_argument("--dir_b", required=True)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--vgg_weights", type=str, default=None)
    ap.add_argument("--inception_weights", type=str, default=None,
                    help=".npz from tools/convert_inception_weights.py — "
                         "canonical InceptionV3-pool3 FID (takes precedence)")
    args = ap.parse_args()

    from msig_tpu.eval import fid_between_dirs

    score = fid_between_dirs(
        args.dir_a, args.dir_b, args.image_size, args.batch_size,
        args.vgg_weights, args.inception_weights,
    )
    metric = ("fid_inception_pool3" if args.inception_weights
              else "fid_vgg_prefix" if args.vgg_weights
              else "proxy_fid_random_vgg")
    print(json.dumps({
        "metric": metric,
        "value": round(score, 4),
        "dir_a": args.dir_a,
        "dir_b": args.dir_b,
    }))


if __name__ == "__main__":
    main()
